"""Reference-execution shim for the ``torchflows`` surface the reference
consumes (see README.md in the parent directory). Validation harness only —
never importable from nfmc_tpu itself."""
from .architectures import NICE, RealNVP  # noqa: F401
from .bijections.base import Bijection  # noqa: F401
from .flows import Flow  # noqa: F401
