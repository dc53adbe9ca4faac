"""Scheduler parity vs the reference FlowMatch(Pair)Scheduler (torch, CPU)."""

import numpy as np
import pytest
import torch

from dualforce_tpu.config import SchedulerConfig
from dualforce_tpu.diffusion import FlowMatchPairScheduler, FlowMatchScheduler

from _torch_ref import load

ref_fm = load("mova.diffusion.schedulers.flow_match")
ref_pair = load("mova.diffusion.schedulers.flow_match_pair")


def _ref_scheduler(**kw):
    return ref_fm.FlowMatchScheduler(**kw)


@pytest.mark.parametrize("shift,extra_one_step,steps", [
    (3.0, False, 100),
    (5.0, True, 50),
    (5.0, True, 1000),
])
def test_sigma_tables_match(shift, extra_one_step, steps):
    ours = FlowMatchScheduler(SchedulerConfig(shift=shift, extra_one_step=extra_one_step))
    ours.set_timesteps(steps)
    ref = _ref_scheduler(shift=shift, extra_one_step=extra_one_step)
    ref.set_timesteps(steps)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), rtol=1e-6, atol=1e-4)


def test_step_and_add_noise_match():
    ours = FlowMatchScheduler(SchedulerConfig(shift=5.0, extra_one_step=True))
    ours.set_timesteps(50)
    ref = _ref_scheduler(shift=5.0, extra_one_step=True)
    ref.set_timesteps(50)

    x = np.random.default_rng(0).standard_normal((2, 4)).astype(np.float32)
    v = np.random.default_rng(1).standard_normal((2, 4)).astype(np.float32)
    for t in [ours.timesteps[0], ours.timesteps[17], ours.timesteps[-1]]:
        got = ours.step(v, float(t), x)
        want = ref.step(torch.tensor(v), torch.tensor(float(t)), torch.tensor(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

        got = ours.add_noise(x, v, float(t))
        want = ref.add_noise(torch.tensor(x), torch.tensor(v), torch.tensor(float(t))).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_training_weight_matches():
    ours = FlowMatchScheduler(SchedulerConfig(shift=5.0, extra_one_step=True))
    ours.set_timesteps(1000, training=True)
    ref = _ref_scheduler(shift=5.0, extra_one_step=True)
    ref.set_timesteps(1000, training=True)
    np.testing.assert_allclose(
        ours.linear_timesteps_weights, ref.linear_timesteps_weights.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    for t in [ours.timesteps[3], ours.timesteps[500]]:
        np.testing.assert_allclose(
            ours.training_weight(float(t)),
            ref.training_weight(torch.tensor(float(t))).item(), rtol=1e-3,
        )


def test_pair_scheduler_default_and_dual_shift():
    ours = FlowMatchPairScheduler(SchedulerConfig(shift=5.0, extra_one_step=True))
    ref = ref_pair.FlowMatchPairScheduler(shift=5.0, extra_one_step=True)
    ours.set_timesteps(50)
    ref.set_timesteps(50)
    np.testing.assert_allclose(ours.get_pairs(), ref.get_pairs().numpy(), rtol=1e-6, atol=1e-4)

    ours.set_pair_postprocess_by_name("dual_sigma_shift", visual_shift=5.0, audio_shift=3.0)
    ref.set_pair_postprocess_by_name("dual_sigma_shift", visual_shift=5.0, audio_shift=3.0)
    np.testing.assert_allclose(ours.get_pairs(), ref.get_pairs().numpy(), rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(
        ours.get_pairs("sigmas"), ref.get_pairs(source="sigmas").numpy(), rtol=1e-6, atol=1e-7
    )


def test_step_from_to_matches():
    ours = FlowMatchPairScheduler(SchedulerConfig(shift=5.0, extra_one_step=True))
    ref = ref_pair.FlowMatchPairScheduler(shift=5.0, extra_one_step=True)
    ours.set_timesteps(50)
    ref.set_timesteps(50)
    ours.set_pair_postprocess_by_name("dual_sigma_shift", visual_shift=5.0, audio_shift=4.0)
    ref.set_pair_postprocess_by_name("dual_sigma_shift", visual_shift=5.0, audio_shift=4.0)

    pairs = ours.get_pairs()
    x = np.random.default_rng(0).standard_normal((2, 3)).astype(np.float32)
    v = np.random.default_rng(1).standard_normal((2, 3)).astype(np.float32)
    for i in [0, 10, 48]:
        t_from, t_to = pairs[i, 1], pairs[i + 1, 1]
        got = ours.step_from_to(v, float(t_from), float(t_to), x)
        want = ref.step_from_to(
            torch.tensor(v), torch.tensor(float(t_from)), torch.tensor(float(t_to)),
            torch.tensor(x),
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # terminal step
    got = ours.step_from_to(v, float(pairs[-1, 0]), None, x)
    want = ref.step_from_to(torch.tensor(v), torch.tensor(float(pairs[-1, 0])), None,
                            torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pair_sigma_columns_consistent_with_step_from_to():
    ours = FlowMatchPairScheduler(SchedulerConfig(shift=5.0, extra_one_step=True))
    ours.set_timesteps(50)
    vis, aud = ours.pair_sigma_columns()
    assert vis.shape == (51,) and aud.shape == (51,)
    pairs = ours.get_pairs()
    x = np.ones((1,), np.float32)
    v = np.full((1,), 2.0, np.float32)
    for i in [0, 25, 49]:
        t_to = float(pairs[i + 1, 0]) if i + 1 < 50 else None
        want = ours.step_from_to(v, float(pairs[i, 0]), t_to, x)
        got = x + v * (vis[i + 1] - vis[i])
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_flow_match_euler_discrete():
    """Diffusers-API scheduler (registered by name like the reference's
    schedulers/__init__.py:1-10): shift-warped sigmas, Euler integration of a
    constant velocity field recovers the endpoint exactly."""
    import numpy as np

    from dualforce_tpu.diffusion.flow_match import FlowMatchEulerDiscreteScheduler
    from dualforce_tpu.registry import DIFFUSION_SCHEDULERS

    assert "FlowMatchEulerDiscreteScheduler" in DIFFUSION_SCHEDULERS

    s = FlowMatchEulerDiscreteScheduler(shift=3.0)
    s.set_timesteps(25)
    assert s.timesteps.shape == (25,) and s.sigmas.shape == (26,)
    assert s.sigmas[0] == 1.0 and s.sigmas[-1] == 0.0
    # shift warp: sigma' = s*sigma/(1+(s-1)*sigma) of linspace(1, 1/1000, 25)
    lin = np.linspace(1.0, 1e-3, 25)
    np.testing.assert_allclose(s.sigmas[:-1], 3 * lin / (1 + 2 * lin), rtol=1e-6)

    # x_t = (1-sigma)x0 + sigma*n; stepping v = n - x0 from sigma=1 hits x0+... 
    x0, n = np.float64(0.25), np.float64(-1.5)
    x = s.scale_noise(x0, s.timesteps[0], n)
    assert np.isclose(x, n)          # sigma(t_max) = 1
    v = n - x0
    for t in s.timesteps:
        (x,) = s.step(v, t, x)
    np.testing.assert_allclose(x, x0, atol=1e-6)

    # scale_noise at an interior timestep uses the matching sigma
    t5 = s.timesteps[5]
    np.testing.assert_allclose(
        s.scale_noise(x0, t5, n),
        (1 - s.sigmas[5]) * x0 + s.sigmas[5] * n, rtol=1e-6)
