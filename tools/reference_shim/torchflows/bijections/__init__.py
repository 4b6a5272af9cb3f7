from .base import Bijection  # noqa: F401
