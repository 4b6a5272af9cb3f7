"""Checkpoint/resume (a capability the reference lacks — SURVEY.md section 5):
npz roundtrip and symmetric nested sampler-state restore (ADVICE round 1:
restore must recurse as deep as save does)."""
import jax
import jax.numpy as jnp
import numpy as np

from nfmc_tpu.checkpoint import (
    load_checkpoint,
    restore_sampler_state,
    sampler_state,
    save_checkpoint,
)
from nfmc_tpu.samplers.mcmc import MALA
from nfmc_tpu.samplers.nfmc import JumpMALA

from tests.util import standard_gaussian_potential


def test_npz_roundtrip(tmp_path):
    state = {"a": jnp.arange(4.0), "b": [jnp.ones((2, 3)), jnp.asarray(7)]}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, metadata={"step": 12})
    restored, meta = load_checkpoint(path, state)
    assert meta == {"step": 12}
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))
    assert int(restored["b"][1]) == 7


def test_sampler_state_restores_nested_tuned_kernel(tmp_path):
    x0 = jax.random.normal(jax.random.key(0), (8, 5))
    src = JumpMALA((5,), standard_gaussian_potential)
    src.inner_sampler.params.n_warmup_iterations = 20
    src.inner_sampler.warmup(x0, show_progress=False)  # tunes the inner kernel
    tuned_step = float(src.inner_sampler.kernel.step_size)

    state = sampler_state(src, x0, jax.random.key(1))
    path = str(tmp_path / "jump.npz")
    save_checkpoint(path, state)

    dst = JumpMALA((5,), standard_gaussian_potential)
    assert float(dst.inner_sampler.kernel.step_size) != tuned_step
    loaded, _ = load_checkpoint(path, sampler_state(dst, x0, jax.random.key(1)))
    x, key = restore_sampler_state(dst, loaded)
    assert np.allclose(np.asarray(x), np.asarray(x0))
    assert float(dst.inner_sampler.kernel.step_size) == tuned_step
    out = dst.sample(x, show_progress=False, key=key)
    assert np.isfinite(out.samples).all()


def test_superset_kernels_roundtrip_tuned_state(tmp_path):
    """ChEES / AIES / PT kernels implement the make_state/sync_from_state
    checkpoint contract: warmup-tuned state survives a save/load cycle."""
    from nfmc_tpu.samplers.mcmc import AIES, CheesHMC, PTMALA

    x0 = jax.random.normal(jax.random.key(0), (16, 5))
    cases = [
        ("chees", CheesHMC((5,), standard_gaussian_potential)),
        ("aies", AIES((5,), standard_gaussian_potential)),
        ("pt", PTMALA((5,), standard_gaussian_potential)),
    ]
    for name, src in cases:
        src.params.n_warmup_iterations = 10
        src.warmup(x0, show_progress=False)
        state = sampler_state(src, x0, jax.random.key(1))
        path = str(tmp_path / f"{name}.npz")
        save_checkpoint(path, state)

        dst = type(src)((5,), standard_gaussian_potential)
        loaded, _ = load_checkpoint(path, sampler_state(dst, x0, jax.random.key(1)))
        x, key = restore_sampler_state(dst, loaded)
        assert np.allclose(np.asarray(x), np.asarray(x0))
        # every leaf of the tuned kernel state must match the source's
        src_leaves = jax.tree_util.tree_leaves(src.kernel.make_state())
        dst_leaves = jax.tree_util.tree_leaves(dst.kernel.make_state())
        for a, b in zip(src_leaves, dst_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        out = dst.sample(x, show_progress=False, key=key)
        assert np.isfinite(np.asarray(out.running_samples.last_sample)).all()


def test_restore_recurses_to_arbitrary_depth():
    """ADVICE round 1: a doubly-nested sampler must resume its deepest tuned
    state, not silently keep defaults."""

    class Shell:
        """Minimal sampler-shaped object: a kernel plus an optional inner."""

        def __init__(self, kernel, inner=None):
            self.kernel = kernel
            if inner is not None:
                self.inner_sampler = inner

    inner_inner = MALA((3,), standard_gaussian_potential)
    inner_inner.kernel.step_size = 0.777
    nested = Shell(JumpMALA((3,), standard_gaussian_potential).kernel,
                   Shell(JumpMALA((3,), standard_gaussian_potential).kernel, inner_inner))

    x0 = jnp.zeros((4, 3))
    state = sampler_state(nested, x0, jax.random.key(2))
    assert "inner" in state and "inner" in state["inner"]  # depth-2 saved

    fresh_deep = MALA((3,), standard_gaussian_potential)
    fresh = Shell(JumpMALA((3,), standard_gaussian_potential).kernel,
                  Shell(JumpMALA((3,), standard_gaussian_potential).kernel, fresh_deep))
    assert float(fresh_deep.kernel.step_size) != 0.777
    restore_sampler_state(fresh, state)
    assert abs(float(fresh_deep.kernel.step_size) - 0.777) < 1e-6


def test_sample_resumable_bit_exact_after_crash(tmp_path):
    """sample_resumable: a run killed mid-way and resumed from its checkpoint
    must produce the BIT-EXACT final state and identical counters as an
    uninterrupted segmented run (per-segment fold_in keys)."""
    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 40
        s.params.store_samples = True
        return s

    # uninterrupted segmented reference
    out_a = sample_resumable(
        fresh(), x0, str(tmp_path / "a"), segment_iterations=10, seed=5,
        show_progress=False, save_samples=True,
    )

    # crash after 2 of 4 segments
    crash = fresh()
    orig_sample = crash.sample
    calls = {"n": 0}

    def crashing_sample(*a, **k):
        if calls["n"] == 2:
            raise RuntimeError("simulated preemption")
        calls["n"] += 1
        return orig_sample(*a, **k)

    crash.sample = crashing_sample
    try:
        sample_resumable(crash, x0, str(tmp_path / "b"), segment_iterations=10,
                         seed=5, show_progress=False, save_samples=True)
        raise AssertionError("expected simulated crash")
    except RuntimeError as e:
        assert "preemption" in str(e)

    # resume on a FRESH sampler from the crash checkpoint
    out_c = sample_resumable(
        fresh(), x0, str(tmp_path / "b"), segment_iterations=10, seed=5,
        show_progress=False, save_samples=True,
    )

    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )
    sa, sc = out_a.statistics, out_c.statistics
    for f in ("n_accepted_trajectories", "n_attempted_trajectories",
              "n_divergences", "n_target_calls", "n_target_gradient_calls"):
        assert getattr(sa, f) == getattr(sc, f), f
    np.testing.assert_allclose(np.asarray(sa.running_first_moment),
                               np.asarray(sc.running_first_moment), rtol=1e-12)
    # full 40 stored draws survive the crash via save_samples=True
    assert out_c.running_samples.n_samples == 40
    np.testing.assert_array_equal(np.asarray(out_a.samples), np.asarray(out_c.samples))


def test_sample_resumable_jump_sampler(tmp_path):
    """Flow-kernel samplers round-trip too (flow params live in the state)."""
    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(1), (4, 5))

    def fresh():
        s = JumpMALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 8
        return s

    out_a = sample_resumable(fresh(), x0, str(tmp_path / "ja"),
                             segment_iterations=4, seed=7, show_progress=False)
    # crash after 1 segment, resume
    crash = fresh()
    orig = crash.sample
    state = {"n": 0}

    def crashing(*a, **k):
        if state["n"] == 1:
            raise RuntimeError("boom")
        state["n"] += 1
        return orig(*a, **k)

    crash.sample = crashing
    try:
        sample_resumable(crash, x0, str(tmp_path / "jb"),
                         segment_iterations=4, seed=7, show_progress=False)
    except RuntimeError:
        pass
    out_c = sample_resumable(fresh(), x0, str(tmp_path / "jb"),
                             segment_iterations=4, seed=7, show_progress=False)
    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )
    assert out_a.statistics.n_attempted_jumps == out_c.statistics.n_attempted_jumps


def test_front_door_checkpoint_resume(tmp_path, monkeypatch):
    """sample(checkpoint_path=...): crash mid-sampling, re-call resumes
    (skipping warmup) and finishes bit-exact; the file is deleted on
    success."""
    import os

    import pytest

    import nfmc_tpu
    from nfmc_tpu.samplers.mcmc.langevin import MALA

    path = str(tmp_path / "fd")
    cfg = dict(
        target=standard_gaussian_potential, event_shape=(5,), flow=None,
        strategy="mala", n_chains=8, n_iterations=20, n_warmup_iterations=10,
        warmup=True, show_progress=False, seed=9,
        checkpoint_path=path, checkpoint_segment_iterations=5,
    )
    out_a = nfmc_tpu.sample(**cfg)
    assert not os.path.exists(path + ".npz")  # deleted on success

    orig = MALA.sample
    calls = {"n": 0}

    def crashing(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 3:  # 3rd SAMPLING segment (warmup uses .warmup)
            raise RuntimeError("boom")
        return orig(self, *a, **k)

    monkeypatch.setattr(MALA, "sample", crashing)
    with pytest.raises(RuntimeError, match="boom"):
        nfmc_tpu.sample(**cfg)
    assert os.path.exists(path + ".npz")  # crash left the checkpoint

    monkeypatch.setattr(MALA, "sample", orig)
    out_c = nfmc_tpu.sample(**cfg)  # resumes, skips warmup
    assert not os.path.exists(path + ".npz")

    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )
    assert out_a.statistics.n_attempted_trajectories == \
        out_c.statistics.n_attempted_trajectories


def test_front_door_resume_ess_keeps_tuned_ellipse(tmp_path, monkeypatch):
    """ESS's warmup-adapted ellipse lives outside make_state/sync_from_state;
    the extras hook must carry it so a resumed run is bit-exact (a lost
    ellipse would change every draw)."""
    import os

    import pytest

    import nfmc_tpu
    from nfmc_tpu.samplers.mcmc.ess import ESS

    path = str(tmp_path / "ess")
    cfg = dict(
        target=standard_gaussian_potential, event_shape=(5,), flow=None,
        strategy="ess", negative_log_likelihood=standard_gaussian_potential,
        n_chains=8, n_iterations=12, n_warmup_iterations=30, warmup=True,
        show_progress=False, seed=4,
        checkpoint_path=path, checkpoint_segment_iterations=4,
    )
    out_a = nfmc_tpu.sample(**cfg)
    assert not os.path.exists(path + ".npz")

    # segments after the first enter via sample_continue (the ESS prior
    # redraw must happen exactly once per run) — crash the second segment
    orig = ESS.sample_continue
    calls = {"n": 0}

    def crashing(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return orig(self, *a, **k)

    monkeypatch.setattr(ESS, "sample_continue", crashing)
    with pytest.raises(RuntimeError, match="boom"):
        nfmc_tpu.sample(**cfg)
    assert os.path.exists(path + ".npz")
    monkeypatch.setattr(ESS, "sample_continue", orig)
    out_c = nfmc_tpu.sample(**cfg)  # resume skips warmup, restores ellipse
    assert not os.path.exists(path + ".npz")
    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )


def test_sample_resumable_rejects_mismatched_config(tmp_path):
    """A checkpoint written under one segmentation must not silently resume
    under another."""
    import pytest

    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (4, 5))
    s = MALA((5,), standard_gaussian_potential)
    s.params.n_iterations = 20
    orig = s.sample
    state = {"n": 0}

    def crashing(*a, **k):
        if state["n"] == 1:
            raise RuntimeError("boom")
        state["n"] += 1
        return orig(*a, **k)

    s.sample = crashing
    with pytest.raises(RuntimeError):
        sample_resumable(s, x0, str(tmp_path / "m"), segment_iterations=5, seed=1)
    s.sample = orig
    with pytest.raises(ValueError, match="segment_iterations"):
        sample_resumable(s, x0, str(tmp_path / "m"), segment_iterations=10, seed=1)


def test_sample_resumable_completed_checkpoint_rebuilds_output(tmp_path):
    """A crash between the final segment save and the caller's cleanup must
    not strand the run: re-invocation rebuilds the completed output."""
    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (4, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 12
        return s

    out_a = sample_resumable(fresh(), x0, str(tmp_path / "c"),
                             segment_iterations=4, seed=2, save_samples=True)
    # checkpoint intentionally left on disk: simulate the caller dying here
    out_b = sample_resumable(fresh(), x0, str(tmp_path / "c"),
                             segment_iterations=4, seed=2, save_samples=True)
    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_b.running_samples.last_sample),
    )
    assert out_b.statistics.n_attempted_trajectories == \
        out_a.statistics.n_attempted_trajectories
    np.testing.assert_array_equal(np.asarray(out_a.samples), np.asarray(out_b.samples))


def test_sample_continue_entry_semantics(tmp_path):
    """Samplers with run-entry quirks (TESS latent x0, DLMC init step,
    NeuTra transport) continue cleanly across segments: segmented runs stay
    finite and recover the standard-Gaussian moments."""
    from nfmc_tpu.checkpoint import sample_resumable
    from nfmc_tpu.samplers.nfmc import DLMC, TESS, NeuTraHMC

    x0 = jax.random.normal(jax.random.key(0), (16, 5))
    for name, build in (
        ("tess", lambda: TESS((5,), standard_gaussian_potential,
                              negative_log_likelihood=standard_gaussian_potential)),
        ("dlmc", lambda: DLMC((5,), standard_gaussian_potential,
                              negative_log_likelihood=standard_gaussian_potential)),
        ("neutra", lambda: NeuTraHMC((5,), standard_gaussian_potential)),
    ):
        s = build()
        s.params.n_iterations = 30
        out = sample_resumable(s, x0, str(tmp_path / name),
                               segment_iterations=10, seed=3,
                               show_progress=False, save_samples=True)
        draws = np.asarray(out.samples)
        assert np.isfinite(draws).all(), name
        assert out.running_samples.n_samples == 30, name
        # crude sanity: segmented chains stay near the standard Gaussian
        assert float(np.abs(np.asarray(out.mean)).max()) < 1.0, name


def test_segmented_run_statistically_matches_unsegmented(tmp_path):
    """Segmentation must be statistically transparent: a segmented MALA run
    and a single-call run from the same start recover the same posterior
    (different RNG schedules, so compare moments, not bits)."""
    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (64, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 400
        return s

    seg = sample_resumable(fresh(), x0, str(tmp_path / "seg"),
                           segment_iterations=100, seed=11, show_progress=False)
    whole = fresh().sample(x0, show_progress=False, seed=11)
    m_seg = np.asarray(seg.statistics.running_second_moment)
    m_whole = np.asarray(whole.statistics.running_second_moment)
    # both should sit near the true second moment (1.0) within MC error
    assert np.max(np.abs(m_seg - 1.0)) < 0.15
    assert np.max(np.abs(m_seg - m_whole)) < 0.2
    assert seg.statistics.n_attempted_trajectories == \
        whole.statistics.n_attempted_trajectories


def test_pt_continuation_carries_hot_rungs(tmp_path):
    """PT's hot replica positions live in the scan carry, not PTState; the
    continuation protocol must carry them through crash/resume bit-exactly
    (the plain entry collapses every rung onto the cold state)."""
    from nfmc_tpu.checkpoint import sample_resumable
    from nfmc_tpu.samplers.mcmc import PTMALA

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = PTMALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 12
        return s

    out_a = sample_resumable(fresh(), x0, str(tmp_path / "pa"),
                             segment_iterations=4, seed=13, show_progress=False)
    crash = fresh()
    orig = crash.sample_continue
    state = {"n": 0}

    def crashing(*a, **k):
        if state["n"] == 1:
            raise RuntimeError("boom")
        state["n"] += 1
        return orig(*a, **k)

    crash.sample_continue = crashing
    try:
        sample_resumable(crash, x0, str(tmp_path / "pb"),
                         segment_iterations=4, seed=13, show_progress=False)
    except RuntimeError:
        pass
    # the crash checkpoint carries the hot rungs
    data = np.load(str(tmp_path / "pb") + ".npz")
    assert any(k.startswith("extra__pt_hot_rungs") for k in data.files)
    out_c = sample_resumable(fresh(), x0, str(tmp_path / "pb"),
                             segment_iterations=4, seed=13, show_progress=False)
    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )


def test_adaptive_imh_schedule_survives_resume(tmp_path):
    """AdaptiveIMH's refit probability decays with the ABSOLUTE iteration
    index across segments and resumes (no per-segment reset to ~1)."""
    from nfmc_tpu.checkpoint import sample_resumable
    from nfmc_tpu.flows import Flow, RealNVP
    from nfmc_tpu.samplers.nfmc import AdaptiveIMH
    from nfmc_tpu.samplers.nfmc.imh import IMHKernel

    x0 = jax.random.normal(jax.random.key(0), (4, 5))

    def fresh():
        # explicit flow seed: AdaptiveIMH refits the flow, so bit-exact
        # cross-run comparison needs identical hidden-layer inits (a default
        # flow seeds from the global stream, different per construction)
        s = AdaptiveIMH((5,), standard_gaussian_potential,
                        kernel=IMHKernel((5,), flow=Flow(RealNVP((5,)), seed=123)))
        s.params.n_iterations = 12
        return s

    out_a = sample_resumable(fresh(), x0, str(tmp_path / "ia"),
                             segment_iterations=4, seed=17, show_progress=False)
    crash = fresh()
    orig = crash.sample_continue
    state = {"n": 0}

    def crashing(*a, **k):
        if state["n"] == 1:
            raise RuntimeError("boom")
        state["n"] += 1
        return orig(*a, **k)

    crash.sample_continue = crashing
    try:
        sample_resumable(crash, x0, str(tmp_path / "ib"),
                         segment_iterations=4, seed=17, show_progress=False)
    except RuntimeError:
        pass
    data = np.load(str(tmp_path / "ib") + ".npz")
    assert any(k.startswith("extra__imh_iters_done") for k in data.files)
    resumed = fresh()
    out_c = sample_resumable(resumed, x0, str(tmp_path / "ib"),
                             segment_iterations=4, seed=17, show_progress=False)
    np.testing.assert_array_equal(
        np.asarray(out_a.running_samples.last_sample),
        np.asarray(out_c.running_samples.last_sample),
    )
    assert resumed._iters_done == 12  # absolute schedule position at the end


def test_tree_signature_is_structural_not_repr(tmp_path):
    """VERDICT r2 item 10: checkpoint structure validation must not depend on
    ``repr(treedef)`` (not a stable contract across JAX versions). The meta
    carries a key-path signature; a legacy/garbage repr field must be
    ignored, and a signature mismatch must fail loudly."""
    import json as _json

    import pytest

    from nfmc_tpu.checkpoint import _tree_signature, sample_resumable

    # determinism + structure sensitivity, no repr() involved
    a = {"x": jnp.zeros(3), "k": [jnp.ones(2), jnp.asarray(1)]}
    b = {"x": jnp.zeros(3), "k": [jnp.ones(2), jnp.asarray(1)]}
    assert _tree_signature(a) == _tree_signature(b)
    assert _tree_signature(a) != _tree_signature(
        {"y": jnp.zeros(3), "k": [jnp.ones(2), jnp.asarray(1)]}
    )
    assert _tree_signature(a) != _tree_signature({"x": jnp.zeros(3), "k": jnp.ones(2)})
    # no memory addresses / object ids leak into the signature
    assert "0x" not in _tree_signature(a)

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 20
        return s

    path = str(tmp_path / "sig")

    crash = fresh()
    orig = crash.sample_continue
    n = {"v": 0}

    def crashing(*args, **kw):
        if n["v"] == 1:
            raise RuntimeError("boom")
        n["v"] += 1
        return orig(*args, **kw)

    crash.sample_continue = crashing
    try:
        sample_resumable(crash, x0, path, segment_iterations=5, seed=3,
                         show_progress=False)
    except RuntimeError:
        pass

    def rewrite_meta(mutate):
        f = path + ".npz"
        data = dict(np.load(f))
        meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
        mutate(meta)
        data["__meta__"] = np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8)
        np.savez(f, **data)

    # a JAX-version-style repr change (simulated: garbage legacy field) must
    # NOT produce a false reject — the signature governs
    rewrite_meta(lambda m: m.__setitem__("treedef", "PyTreeDef(<garbage 0xdead>)"))
    out = sample_resumable(fresh(), x0, path, segment_iterations=5, seed=3,
                           show_progress=False)
    assert out.statistics.n_attempted_trajectories == 20 * 8

    # ... and a signature mismatch must fail loudly (no false accept)
    crash3 = fresh()
    orig3 = crash3.sample_continue
    m = {"v": 0}

    def crashing3(*args, **kw):
        if m["v"] == 1:
            raise RuntimeError("boom")
        m["v"] += 1
        return orig3(*args, **kw)

    crash3.sample_continue = crashing3
    path2 = str(tmp_path / "sig2")
    try:
        sample_resumable(crash3, x0, path2, segment_iterations=5, seed=3,
                         show_progress=False)
    except RuntimeError:
        pass

    def corrupt_sig(meta):
        meta["tree_signature"] = '[[["k","not_the_real_structure"]]]'

    f2 = path2 + ".npz"
    data = dict(np.load(f2))
    meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
    corrupt_sig(meta)
    data["__meta__"] = np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(f2, **data)
    with pytest.raises(ValueError, match="state structure"):
        sample_resumable(fresh(), x0, path2, segment_iterations=5, seed=3,
                         show_progress=False)


def test_save_samples_recorded_and_validated(tmp_path):
    """ADVICE r2: the checkpoint meta records save_samples; resuming with a
    contradicting explicit flag raises, and the default (None) adopts the
    original run's setting so stored draws never silently drop segments."""
    import pytest

    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 40
        s.params.store_samples = True
        return s

    path = str(tmp_path / "ss")
    crash = fresh()
    orig = crash.sample_continue
    n = {"v": 0}

    def crashing(*args, **kw):
        if n["v"] == 1:
            raise RuntimeError("boom")
        n["v"] += 1
        return orig(*args, **kw)

    crash.sample_continue = crashing
    try:
        sample_resumable(crash, x0, path, segment_iterations=10, seed=5,
                         show_progress=False, save_samples=True)
    except RuntimeError:
        pass

    # explicit contradiction fails loudly
    with pytest.raises(ValueError, match="save_samples"):
        sample_resumable(fresh(), x0, path, segment_iterations=10, seed=5,
                         show_progress=False, save_samples=False)

    # default (None) adopts save_samples=True from the meta: the final
    # output carries ALL 40 draws, none silently dropped
    out = sample_resumable(fresh(), x0, path, segment_iterations=10, seed=5,
                           show_progress=False)
    assert out.running_samples.n_samples == 40


def test_legacy_meta_save_samples_inferred(tmp_path):
    """Pre-0.4.0 metas never recorded save_samples; resuming one through the
    None default must infer the original setting from the sidecar record
    instead of silently flipping to False and dropping whole segments."""
    import json as _json

    import pytest

    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 40
        s.params.store_samples = True
        return s

    def strip_save_samples(path):
        data = dict(np.load(path + ".npz", allow_pickle=False))
        meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
        assert "save_samples" in meta
        del meta["save_samples"]
        data["__meta__"] = np.frombuffer(
            _json.dumps(meta).encode(), dtype=np.uint8
        )
        np.savez(path + ".npz", **data)
        return meta

    def crash_first_resume(path, save_samples):
        crash = fresh()
        orig = crash.sample_continue
        n = {"v": 0}

        def crashing(*args, **kw):
            if n["v"] == 1:
                raise RuntimeError("boom")
            n["v"] += 1
            return orig(*args, **kw)

        crash.sample_continue = crashing
        try:
            sample_resumable(crash, x0, path, segment_iterations=10, seed=5,
                             show_progress=False, save_samples=save_samples)
        except RuntimeError:
            pass

    # legacy SAVING run: sample_segments non-empty -> inferred True,
    # resume with the None default keeps all 40 draws
    path = str(tmp_path / "legacy_saving")
    crash_first_resume(path, save_samples=True)
    meta = strip_save_samples(path)
    assert meta.get("sample_segments")
    out = sample_resumable(fresh(), x0, path, segment_iterations=10, seed=5,
                           show_progress=False)
    assert out.running_samples.n_samples == 40

    # legacy NON-saving run: no sidecar record -> inferred False; an
    # explicit contradicting True fails loudly instead of fabricating draws
    path2 = str(tmp_path / "legacy_plain")
    crash_first_resume(path2, save_samples=False)
    meta2 = strip_save_samples(path2)
    assert not meta2.get("sample_segments")
    with pytest.raises(ValueError, match="save_samples"):
        sample_resumable(fresh(), x0, path2, segment_iterations=10, seed=5,
                         show_progress=False, save_samples=True)
    out2 = sample_resumable(fresh(), x0, path2, segment_iterations=10, seed=5,
                            show_progress=False)
    assert out2.statistics.n_attempted_trajectories > 0


def test_load_checkpoint_rejects_structure_mismatch(tmp_path):
    """round-3 review: load_checkpoint used to ignore the saved signature —
    a structurally different `like` silently loaded leaves into wrong slots."""
    import pytest

    from nfmc_tpu.checkpoint import load_checkpoint, save_checkpoint

    state = {"a": np.zeros(3), "b": {"c": np.ones(3), "d": np.full(3, 2.0)}}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state)

    # fewer leaves: must raise, not shift-load
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(p, {"a": np.zeros(3), "b": {"c": np.ones(3)}})
    # same leaf count, different key paths: must also raise
    with pytest.raises(ValueError, match="structure"):
        load_checkpoint(p, {"a": np.zeros(3), "b": {"c": np.ones(3), "e": np.ones(3)}})
    # matching structure still round-trips
    restored, _ = load_checkpoint(p, jax.tree_util.tree_map(np.zeros_like, state))
    np.testing.assert_array_equal(restored["b"]["d"], state["b"]["d"])


def test_discard_cleans_crash_window_tmp_npz(tmp_path):
    """A crash between np.savez(tmp) and os.replace leaves `<ckpt>.npz.tmp.npz`
    (full sampler state, possibly draws) — discard must remove it too."""
    from nfmc_tpu.checkpoint import discard_resumable_checkpoint

    path = str(tmp_path / "ck.npz")
    for f in (path, path + ".tmp.npz", path + ".seg0.npy", path + ".seg0.npy.tmp.npy"):
        np.save(f + "__raw", np.zeros(1))  # np.save appends .npy
        import os
        os.replace(f + "__raw.npy", f)
    discard_resumable_checkpoint(path)
    import glob
    assert glob.glob(str(tmp_path / "*")) == []


def test_resume_rejects_flipped_sampler_store_samples(tmp_path):
    """The checkpoint records the SAMPLER's own store_samples; resuming with
    a sampler whose store flag was flipped would contribute no (or extra)
    draws for the remaining segments — fail loudly instead."""
    import pytest

    from nfmc_tpu.checkpoint import sample_resumable

    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh(store):
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 40
        s.params.store_samples = store
        return s

    path = str(tmp_path / "flip")
    crash = fresh(True)
    orig = crash.sample_continue
    n = {"v": 0}

    def crashing(*args, **kw):
        if n["v"] == 1:
            raise RuntimeError("boom")
        n["v"] += 1
        return orig(*args, **kw)

    crash.sample_continue = crashing
    try:
        sample_resumable(crash, x0, path, segment_iterations=10, seed=5,
                         show_progress=False, save_samples=True)
    except RuntimeError:
        pass

    with pytest.raises(ValueError, match="store_samples"):
        sample_resumable(fresh(False), x0, path, segment_iterations=10, seed=5,
                         show_progress=False)
    # matching sampler resumes fine
    out = sample_resumable(fresh(True), x0, path, segment_iterations=10, seed=5,
                           show_progress=False)
    assert out.running_samples.n_samples == 40


def test_pre_signature_checkpoint_refused(tmp_path):
    """VERDICT r3 item 7: files without the key-path signature (pre
    format_version 1, which were validated only by repr(treedef) text) are
    refused with a clear error — no repr-comparison code path remains."""
    import json as _json

    import pytest

    from nfmc_tpu.checkpoint import (load_checkpoint, sample_resumable,
                                     save_checkpoint)

    # load_checkpoint path
    p = str(tmp_path / "legacy_state")
    save_checkpoint(p, {"a": np.zeros(3), "b": np.ones(2)})
    f = p + ".npz"
    data = dict(np.load(f))
    meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
    assert meta.get("format_version") == 1
    del meta["tree_signature"]
    del data["__tree_signature__"]
    data["__meta__"] = np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(f, **data)
    with pytest.raises(ValueError, match="format_version"):
        load_checkpoint(p, {"a": np.zeros(3), "b": np.ones(2)})

    # sample_resumable path
    x0 = jax.random.normal(jax.random.key(0), (8, 5))

    def fresh():
        s = MALA((5,), standard_gaussian_potential)
        s.params.n_iterations = 20
        return s

    crash = fresh()
    orig = crash.sample_continue
    n = {"v": 0}

    def crashing(*args, **kw):
        if n["v"] == 1:
            raise RuntimeError("boom")
        n["v"] += 1
        return orig(*args, **kw)

    crash.sample_continue = crashing
    path = str(tmp_path / "legacy_resume")
    try:
        sample_resumable(crash, x0, path, segment_iterations=5, seed=3,
                         show_progress=False)
    except RuntimeError:
        pass
    f = path + ".npz"
    data = dict(np.load(f))
    meta = _json.loads(bytes(data["__meta__"].tobytes()).decode())
    del meta["tree_signature"]
    if "__tree_signature__" in data:
        del data["__tree_signature__"]
    meta["treedef"] = "PyTreeDef(<legacy repr>)"
    data["__meta__"] = np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(f, **data)
    with pytest.raises(ValueError, match="format_version"):
        sample_resumable(fresh(), x0, path, segment_iterations=5, seed=3,
                         show_progress=False)
