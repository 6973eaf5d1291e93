"""UniPC golden parity: run the reference FlowUniPCMultistepScheduler
(wan/utils/fm_solvers_unipc.py) on CPU as the oracle (diffusers shimmed) and
match trajectories at orders 1-3, with and without the corrector."""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE_DIR, requires_reference
from yume_tpu.diffusion.multistep import sample_unipc
from yume_tpu.diffusion.schedule import unipc_sigmas


def _load_reference_scheduler():
    """Exec fm_solvers_unipc.py with a minimal diffusers shim."""
    import functools
    import inspect

    import torch

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    def register_to_config(fn):
        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(fn)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            self.config = _Cfg({k: v for k, v in bound.arguments.items()
                                if k != "self"})
            return fn(self, *args, **kwargs)
        return wrapper

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        pass

    class ConfigMixin:
        pass

    class SchedulerMixin:
        pass

    shim = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    sch_mod = types.ModuleType("diffusers.schedulers.scheduling_utils")
    sch_mod.SchedulerMixin = SchedulerMixin
    sch_mod.SchedulerOutput = SchedulerOutput
    sch_mod.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    utl_mod = types.ModuleType("diffusers.utils")
    utl_mod.deprecate = lambda *a, **k: None
    utl_mod.is_scipy_available = lambda: False
    schedulers_pkg = types.ModuleType("diffusers.schedulers")
    mods = {
        "diffusers": shim,
        "diffusers.configuration_utils": cfg_mod,
        "diffusers.schedulers": schedulers_pkg,
        "diffusers.schedulers.scheduling_utils": sch_mod,
        "diffusers.utils": utl_mod,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        src = open(f"{REFERENCE_DIR}/wan/utils/fm_solvers_unipc.py").read()
        mod = types.ModuleType("ref_fm_solvers_unipc")
        exec(compile(src, "fm_solvers_unipc.py", "exec"), mod.__dict__)
        return mod.FlowUniPCMultistepScheduler
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _np_velocity(x, sigma):
    """Deterministic nonlinear velocity field shared by oracle and ours."""
    return np.tanh(0.4 * x + sigma) * 0.7 + 0.1 * x


@requires_reference
@pytest.mark.parametrize("order,corrector", [(1, True), (2, True), (3, True),
                                             (2, False), (3, False)])
def test_unipc_matches_reference_scheduler(order, corrector):
    import torch

    FlowUniPC = _load_reference_scheduler()
    steps, shift = 10, 3.0
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((1, 4, 6)).astype(np.float64)

    # --- oracle: reference scheduler driven like wan/text2video.py:181-244
    sched = FlowUniPC(num_train_timesteps=1000, solver_order=order,
                      shift=1.0,
                      disable_corrector=list(range(steps)) if not corrector
                      else [])
    sched.set_timesteps(steps, shift=shift)
    sig = unipc_sigmas(steps, shift)
    # the ladders must agree exactly
    np.testing.assert_allclose(sched.sigmas.numpy(), sig, atol=1e-7)
    x_t = torch.from_numpy(noise.copy())
    for i, t in enumerate(sched.timesteps):
        v = torch.from_numpy(_np_velocity(x_t.numpy(), float(sig[i])))
        x_t = sched.step(v, t, x_t).prev_sample
    want = x_t.numpy()

    # --- ours (x64 so the arithmetic precision matches the oracle)
    import jax

    def denoise(x, s):
        return jnp.asarray(_np_velocity(np.asarray(x, np.float64),
                                        float(s[0])))

    jax.config.update("jax_enable_x64", True)
    try:
        # scan=False: the oracle denoise is a host-side numpy fn that
        # needs concrete sigmas (the scan path is pinned against this
        # unrolled one in test_unipc_scan_matches_unrolled)
        got = sample_unipc(denoise, jnp.asarray(noise, jnp.float64), sig,
                           order=order, use_corrector=corrector, scan=False)
    finally:
        jax.config.update("jax_enable_x64", False)
    # the oracle computes its phi/lambda terms in float32 (its sigma
    # tensors are f32), ours in f64: ~1e-7 residual is expected;
    # order-2 vs order-3 trajectories differ by >1e-3, so this still
    # pins the solver order and corrector wiring exactly
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("order,corrector", [(2, True), (3, True), (2, False)])
def test_unipc_scan_matches_unrolled(order, corrector):
    """The lax.scan UniPC (single model trace — what the scanned quantized
    14B trunk needs) is the SAME recurrence as the unrolled variant the
    reference-golden test validates: exact x64 parity."""
    import jax

    from yume_tpu.diffusion.multistep import sample_unipc
    from yume_tpu.diffusion.schedule import unipc_sigmas

    rng = np.random.default_rng(1)
    noise = rng.standard_normal((1, 4, 6)).astype(np.float64)
    w = jnp.asarray(rng.standard_normal((6, 6)) * 0.3)

    def denoise(x, s):
        return jnp.tanh(x @ w) + 0.1 * s[0]

    sig = unipc_sigmas(9, 4.0)
    jax.config.update("jax_enable_x64", True)
    try:
        a = sample_unipc(denoise, jnp.asarray(noise), sig, order=order,
                         use_corrector=corrector, scan=True)
        b = sample_unipc(denoise, jnp.asarray(noise), sig, order=order,
                         use_corrector=corrector, scan=False)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-12, rtol=1e-12)
