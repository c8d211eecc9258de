"""Criterion tests: forward values vs NumPy oracles, reference-gradient
parity, and documented deviations from autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from back2future_tpu.losses import (
    PhotoConfig, make_obcc, make_obgcc, make_mbcc, make_mssim_l1,
    make_ossim_l1, SmoothConfig, smoothness, second_order_smoothness,
    make_kl_smoothness, make_occ_prior, make_const_vel, make_l2_criterion,
    make_penalty,
)
from back2future_tpu.losses.common import gaussian3_kernel


def arr(shape, seed=0, scale=1.0, offset=0.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale
            + offset).astype(np.float32)


def make_group(b=1, h=6, w=7, c=3, frames=3, seed=0, flow_scale=1.0):
    rng = np.random.default_rng(seed)
    flow = rng.normal(0, 0.5, (b, h, w, 2)).astype(np.float32)
    flow_past = rng.normal(0, 0.5, (b, h, w, 2)).astype(np.float32)
    occ_logits = rng.normal(0, 1, (b, h, w, 2)).astype(np.float32)
    occ = (np.exp(occ_logits)
           / np.exp(occ_logits).sum(-1, keepdims=True)).astype(np.float32)
    warped = tuple(rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
                   for _ in range(frames - 1))
    target = rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
    return flow, flow_past, occ, warped, target


# ---------------------------------------------------------------- oracles

def np_penalty(name):
    if name == "Quadratic":
        return lambda x: x ** 2, lambda x: 2 * x
    if name == "L1":
        return (lambda x: np.sqrt(x ** 2 + 1e-6),
                lambda x: x / np.sqrt(x ** 2 + 1e-6))
    raise ValueError(name)


def np_mask(flow_disp, h, w):
    """In-image mask for tcoord = 1-indexed coords + flow_disp."""
    b = flow_disp.shape[0]
    xs = np.arange(1, w + 1)[None, None, :]
    ys = np.arange(1, h + 1)[None, :, None]
    tx = xs + flow_disp[..., 0]
    ty = ys + flow_disp[..., 1]
    return ((tx >= 1) & (tx <= w) & (ty >= 1) & (ty <= h)).astype(np.float32)


def np_obcc_forward(flow, flow_past, occ, warped, target, cfg, scale):
    papply, _ = np_penalty(cfg.penalty)
    F = cfg.frames
    ref = 0.5 * (F - 1)
    b, h, w, c = target.shape
    acc = np.zeros((b, h, w), np.float32)
    for f in range(1, F):
        img = warped[f - 1]
        photo = papply(img - target).sum(-1)
        if f <= ref:
            fl = flow_past if cfg.past_flow else flow
            disp = (f - ref - 1) * fl * scale
            ow = occ[..., 1]
        else:
            disp = (f - ref) * flow * scale
            ow = occ[..., 0]
        m = np_mask(disp, h, w)
        acc += photo * ow * m + (1 - m) * cfg.penalty_out
    out = acc.sum() / (c * (F - 1))
    if cfg.size_average:
        out *= 1.0 / (b * h * w)
    return out


def np_obgcc_forward(flow, flow_past, occ, warped, target, cfg, scale):
    papply, _ = np_penalty(cfg.penalty)
    F = cfg.frames
    ref = 0.5 * (F - 1)
    b, h, w, c = target.shape

    def fdx(x):
        d = np.zeros_like(x); d[:, :, :-1] = x[:, :, 1:] - x[:, :, :-1]; return d

    def fdy(x):
        d = np.zeros_like(x); d[:, :-1] = x[:, 1:] - x[:, :-1]; return d

    tgx, tgy = fdx(target), fdy(target)
    acc = np.zeros((b, h, w), np.float32)
    agx = np.zeros_like(target)
    agy = np.zeros_like(target)
    for f in range(1, F):
        img = warped[f - 1]
        agx = agx + fdx(img)        # reference accumulates across frames
        agy = agy + fdy(img)
        tmp = (papply(img - target).sum(-1)
               + cfg.beta * papply(agx - tgx).sum(-1)
               + cfg.gamma * papply(agy - tgy).sum(-1))
        if f <= ref:
            fl = flow_past if cfg.past_flow else flow
            disp = (f - ref - 1) * fl * scale
            ow = occ[..., 1]
        else:
            disp = (f - ref) * flow * scale
            ow = occ[..., 0]
        m = np_mask(disp, h, w)
        acc += tmp * ow * m + (1 - m) * cfg.penalty_out
    out = acc.sum() / (c * (F - 1))
    if cfg.size_average:
        out *= 1.0 / (b * h * w)
    return out


def np_gauss3(x, k):
    """3x3 depthwise conv with replication padding
    (MSSIML1Criterion.lua:37-44: SpatialReplicationPadding(1,1,1,1) +
    per-channel 3x3 conv)."""
    h, w = x.shape[1], x.shape[2]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + k[dy, dx] * xp[:, dy:dy + h, dx:dx + w]
    return out


def np_ssim_forward(flow, flow_past, occ, warped, target, cfg, scale,
                    occlusion_aware):
    """Independent transcription of MSSIML1Criterion.lua:46-153 /
    OSSIML1Criterion.lua:48-170 updateOutput (NumPy, NHWC)."""
    F = cfg.frames
    ref = 0.5 * (F - 1)
    b, h, w, c = target.shape
    k = gaussian3_kernel()
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    # the ctor default penalty is L1; model.lua:189-193 only swaps in
    # L1/Lorentzian
    if cfg.penalty == "Lorentzian":
        eps2 = 0.05 ** 2
        papply = lambda x: np.log1p(0.5 * x * x / eps2)
    else:
        papply = lambda x: np.sqrt(x * x + 1e-6)

    if occlusion_aware:
        vals = [target, *warped]          # OSSIML1Criterion.lua:64-67
    else:                                 # MSSIML1Criterion.lua:63-68
        vals = [target]
        if cfg.past_flow:
            vals.append(flow_past)
        if F > 2:
            vals.append(occ)
        vals += list(warped)
    mx = max(float(v.max()) for v in vals)
    mn = min(float(v.min()) for v in vals)

    t = (target - mn) / (mx - mn)
    mu_y = np_gauss3(t, k)
    sigma_y = np_gauss3(t * t, k) - mu_y ** 2
    acc = np.zeros((b, h, w), np.float64)
    for f in range(1, F):
        img = (warped[f - 1] - mn) / (mx - mn)
        mu_x = np_gauss3(img, k)
        sigma_x = np_gauss3(img * img, k) - mu_x ** 2
        sigma_xy = np_gauss3(img * t, k) - mu_x * mu_y
        l = (2 * mu_x * mu_y + C1) / (mu_x ** 2 + mu_y ** 2 + C1)
        cs = (2 * sigma_xy + C2) / (sigma_x + sigma_y + C2)
        tmp = (cfg.alpha * (1 - l * cs).sum(-1)
               + (1 - cfg.alpha) * papply(img - t).sum(-1))
        if F == 2:
            disp = flow * scale           # MSSIML1Criterion.lua:121-122
        elif f <= ref:
            fl = flow_past if cfg.past_flow else flow
            disp = (f - ref - 1) * fl * scale
        else:
            disp = (f - ref) * flow * scale
        m = np_mask(disp, h, w)
        if occlusion_aware:
            ow = occ[..., 1] if f <= ref else occ[..., 0]
            tmp = tmp * ow * m + (1 - m) * cfg.penalty_out
        else:
            tmp = tmp * m
        acc += tmp
    out = acc.sum() / (c * (F - 1))
    if cfg.size_average:
        out /= b * h * w
    return out


# ---------------------------------------------------------------- tests

class TestPenalties:
    def test_l1_always_half_power(self):
        p = make_penalty("L1")
        x = jnp.asarray([0.5, -2.0])
        np.testing.assert_allclose(np.asarray(p.apply(x)),
                                   np.sqrt(np.array([0.25, 4.0]) + 1e-6), rtol=1e-6)

    @pytest.mark.parametrize("name", ["Quadratic", "L1", "Lorentzian", "Dirac"])
    def test_der_matches_autodiff(self, name):
        p = make_penalty(name)
        x = jnp.asarray(arr((11,), seed=2))
        auto = jax.vmap(jax.grad(lambda v: p.apply(v)))(x)
        np.testing.assert_allclose(np.asarray(p.der(x)), np.asarray(auto),
                                   rtol=1e-5, atol=1e-6)


class TestOBCC:
    @pytest.mark.parametrize("size_average", [True, False])
    @pytest.mark.parametrize("penalty", ["Quadratic", "L1"])
    def test_forward_vs_oracle(self, size_average, penalty):
        cfg = PhotoConfig(frames=3, penalty=penalty, size_average=size_average)
        group = make_group(seed=1)
        fn = make_obcc(cfg, 4.0)
        got = float(fn(*[jnp.asarray(a) if not isinstance(a, tuple)
                         else tuple(map(jnp.asarray, a)) for a in group]))
        want = np_obcc_forward(*group, cfg, 4.0)
        assert got == pytest.approx(want, rel=1e-5)

    @pytest.mark.parametrize("past_flow", [False, True])
    def test_forward_vs_oracle_frames5(self, past_flow):
        """5-frame window: per-frame displacement multipliers span
        -2..-1 (past, past-flow when enabled) and 1..2 (future), with
        the occ-channel routing per direction (OBCCriterion.lua:79-93)."""
        cfg = PhotoConfig(frames=5, penalty="L1", past_flow=past_flow)
        group = make_group(frames=5, seed=31)
        fn = make_obcc(cfg, 2.0)
        got = float(fn(*[jnp.asarray(a) if not isinstance(a, tuple)
                         else tuple(map(jnp.asarray, a)) for a in group]))
        want = np_obcc_forward(*group, cfg, 2.0)
        assert got == pytest.approx(want, rel=1e-5)

    def test_warped_grads_match_autodiff(self):
        """Image gradients are analytic in the reference -> must equal
        autodiff of the forward."""
        cfg = PhotoConfig(frames=3, penalty="Quadratic")
        cfg_auto = PhotoConfig(frames=3, penalty="Quadratic", reference_grads=False)
        group = tuple(jnp.asarray(a) if not isinstance(a, tuple)
                      else tuple(map(jnp.asarray, a)) for a in make_group(seed=2))
        fn_ref = make_obcc(cfg, 1.0)
        fn_auto = make_obcc(cfg_auto, 1.0)
        d_ref = jax.grad(lambda wrp: fn_ref(group[0], group[1], group[2], wrp, group[4]))(group[3])
        d_auto = jax.grad(lambda wrp: fn_auto(group[0], group[1], group[2], wrp, group[4]))(group[3])
        for a, b in zip(d_ref, d_auto):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_occ_grad_pen_quirk(self):
        """With out-of-image pixels, the reference occ grad = autodiff grad
        + (1-mask)*pen (OBCCriterion.lua:180-190)."""
        cfg = PhotoConfig(frames=3, penalty="Quadratic")
        cfg_auto = PhotoConfig(frames=3, penalty="Quadratic", reference_grads=False)
        flow, flow_past, occ, warped, target = make_group(seed=3)
        flow = flow + 4.0  # push many target coords out of image
        args = (jnp.asarray(flow), jnp.asarray(flow_past), jnp.asarray(occ),
                tuple(map(jnp.asarray, warped)), jnp.asarray(target))
        fn_ref = make_obcc(cfg, 1.0)
        fn_auto = make_obcc(cfg_auto, 1.0)
        d_ref = jax.grad(lambda o: fn_ref(args[0], args[1], o, args[3], args[4]))(args[2])
        d_auto = jax.grad(lambda o: fn_auto(args[0], args[1], o, args[3], args[4]))(args[2])

        b, h, w, c = target.shape
        norm = 1.0 / (c * 2) / (b * h * w)
        m_fut = np_mask((1 - 1) * flow * 1.0, h, w)       # f=2 (future): k=1
        m_fut = np_mask(1 * flow * 1.0, h, w)
        m_past = np_mask(-1 * flow * 1.0, h, w)           # f=1 hard: k=-1
        pen_fut = (1 - m_fut) * cfg.penalty_out * norm    # lands on channel 0
        pen_past = (1 - m_past) * cfg.penalty_out * norm  # lands on channel 1
        np.testing.assert_allclose(np.asarray(d_ref[..., 0] - d_auto[..., 0]),
                                   pen_fut, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_ref[..., 1] - d_auto[..., 1]),
                                   pen_past, atol=1e-6)

    def test_no_flow_grad(self):
        cfg = PhotoConfig(frames=3)
        group = tuple(jnp.asarray(a) if not isinstance(a, tuple)
                      else tuple(map(jnp.asarray, a)) for a in make_group(seed=4))
        fn = make_obcc(cfg, 1.0)
        d_flow = jax.grad(lambda fl: fn(fl, group[1], group[2], group[3], group[4]))(group[0])
        np.testing.assert_array_equal(np.asarray(d_flow), 0.0)


class TestOBGCC:
    def test_forward_vs_oracle(self):
        cfg = PhotoConfig(frames=3, penalty="Quadratic", beta=0.7, gamma=1.0)
        group = make_group(seed=5)
        fn = make_obgcc(cfg, 2.0)
        got = float(fn(jnp.asarray(group[0]), jnp.asarray(group[1]),
                       jnp.asarray(group[2]), tuple(map(jnp.asarray, group[3])),
                       jnp.asarray(group[4])))
        want = np_obgcc_forward(*group, cfg, 2.0)
        assert got == pytest.approx(want, rel=1e-4)

    def test_grads_finite(self):
        cfg = PhotoConfig(frames=3, penalty="L1")
        group = tuple(jnp.asarray(a) if not isinstance(a, tuple)
                      else tuple(map(jnp.asarray, a)) for a in make_group(seed=6))
        fn = make_obgcc(cfg, 1.0)
        grads = jax.grad(lambda o, wrp: fn(group[0], group[1], o, wrp, group[4]),
                         argnums=(0, 1))(group[2], group[3])
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_backward_vs_oracle(self):
        """Independent transcription of OBGCCriterion.lua:151-296
        updateGradInput: cross-frame-accumulated gradient buffers, the
        alpha-only-in-backward brightness asymmetry, the -der + shifted
        +der transpose structure for both image and occlusion gradients,
        out-of-image masking + penalty, occ-channel routing."""
        cfg = PhotoConfig(frames=3, penalty="L1", alpha=0.7, beta=1.3,
                          gamma=0.9)
        flow, _, occ, warped, target = make_group(seed=25)
        scale = 0.8
        fn = make_obgcc(cfg, scale)
        d_warped, d_occ = jax.grad(
            lambda w_, o: fn(jnp.asarray(flow), None, o, w_,
                             jnp.asarray(target)),
            argnums=(0, 1))(tuple(map(jnp.asarray, warped)),
                            jnp.asarray(occ))

        b, h, w, c = target.shape
        pa = lambda x: np.sqrt(x ** 2 + 1e-6)
        pd = lambda x: x / np.sqrt(x ** 2 + 1e-6)

        def fdx(x):
            d = np.zeros_like(x); d[:, :, :-1] = x[:, :, 1:] - x[:, :, :-1]
            return d

        def fdy(x):
            d = np.zeros_like(x); d[:, :-1] = x[:, 1:] - x[:, :-1]
            return d

        tgx, tgy = fdx(target), fdy(target)
        agx = np.zeros_like(target)
        agy = np.zeros_like(target)
        ref = 0.5 * (cfg.frames - 1)
        norm = 1.0 / (c * (cfg.frames - 1)) / (b * h * w)
        want_occ = np.zeros((b, h, w, 2), np.float64)
        for f in range(1, cfg.frames):
            img = warped[f - 1]
            agx = agx + fdx(img)
            agy = agy + fdy(img)
            diff = img - target
            bgx, bgy = agx - tgx, agy - tgy

            gi = cfg.alpha * pd(diff) \
                - cfg.gamma * pd(bgy) - cfg.beta * pd(bgx)
            gi[:, 1:] += cfg.gamma * pd(bgy[:, :-1])
            gi[:, :, 1:] += cfg.beta * pd(bgx[:, :, :-1])

            ob = cfg.alpha * pa(diff).sum(-1) \
                - cfg.gamma * pa(bgy).sum(-1) - cfg.beta * pa(bgx).sum(-1)
            ob[:, 1:] += cfg.gamma * pa(bgy[:, :-1]).sum(-1)
            ob[:, :, 1:] += cfg.beta * pa(bgx[:, :, :-1]).sum(-1)

            disp = (f - ref - 1) * flow * scale if f <= ref \
                else (f - ref) * flow * scale
            m = np_mask(disp, h, w)
            ch = 1 if f <= ref else 0
            want_occ[..., ch] += (ob * m + (1 - m) * cfg.penalty_out) * norm
            gi = gi * m[..., None] * occ[..., ch][..., None] * norm
            np.testing.assert_allclose(np.asarray(d_warped[f - 1]), gi,
                                       rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(d_occ), want_occ,
                                   rtol=2e-4, atol=1e-7)


class TestMBCC:
    def test_no_occ_weighting(self):
        """MBCC ignores occlusions entirely (zero occ grad)."""
        cfg = PhotoConfig(frames=3, penalty="Quadratic")
        group = tuple(jnp.asarray(a) if not isinstance(a, tuple)
                      else tuple(map(jnp.asarray, a)) for a in make_group(seed=7))
        fn = make_mbcc(cfg, 1.0)
        d_occ = jax.grad(lambda o: fn(group[0], group[1], o, group[3], group[4]))(group[2])
        np.testing.assert_array_equal(np.asarray(d_occ), 0.0)

    def test_forward_simple(self):
        cfg = PhotoConfig(frames=3, penalty="Quadratic", size_average=True)
        b, h, w, c = 1, 4, 4, 1
        flow = np.zeros((b, h, w, 2), np.float32)
        occ = np.full((b, h, w, 2), 0.5, np.float32)
        target = np.zeros((b, h, w, c), np.float32)
        warped = (np.full((b, h, w, c), 2.0, np.float32),
                  np.full((b, h, w, c), 3.0, np.float32))
        fn = make_mbcc(cfg, 1.0)
        got = float(fn(jnp.asarray(flow), None, jnp.asarray(occ),
                       tuple(map(jnp.asarray, warped)), jnp.asarray(target)))
        # (4 + 9) summed over pixels / (C*(F-1)) * 1/(BHW) = 13*16/2/16
        assert got == pytest.approx(13.0 / 2.0, rel=1e-6)


class TestSSIMFamily:
    def test_identical_images_low_loss(self):
        cfg = PhotoConfig(frames=3, size_average=True, alpha=1.0)
        b, h, w, c = 1, 8, 8, 3
        rng = np.random.default_rng(8)
        target = rng.random((b, h, w, c)).astype(np.float32)
        warped = (target.copy(), target.copy())
        flow = np.zeros((b, h, w, 2), np.float32)
        occ = np.full((b, h, w, 2), 0.5, np.float32)
        fn = make_mssim_l1(cfg, 1.0)
        got = float(fn(jnp.asarray(flow), None, jnp.asarray(occ),
                       tuple(map(jnp.asarray, warped)), jnp.asarray(target)))
        assert got < 1e-3  # SSIM of identical images ~ 1 -> loss ~ 0

    @pytest.mark.parametrize("past_flow", [False, True])
    @pytest.mark.parametrize("penalty", ["L1", "Lorentzian"])
    def test_mssim_forward_vs_oracle(self, past_flow, penalty):
        cfg = PhotoConfig(frames=3, alpha=0.85, past_flow=past_flow,
                          penalty=penalty)
        flow, flow_past, occ, warped, target = make_group(seed=21)
        fp = flow_past if past_flow else None
        got = float(make_mssim_l1(cfg, 0.7)(
            jnp.asarray(flow), None if fp is None else jnp.asarray(fp),
            jnp.asarray(occ), tuple(map(jnp.asarray, warped)),
            jnp.asarray(target)))
        want = np_ssim_forward(flow, flow_past if past_flow else None, occ,
                               warped, target, cfg, 0.7,
                               occlusion_aware=False)
        assert got == pytest.approx(want, rel=2e-5)

    def test_mssim_forward_vs_oracle_frames5(self):
        cfg = PhotoConfig(frames=5, alpha=0.85)
        flow, _, occ, warped, target = make_group(frames=5, seed=32)
        got = float(make_mssim_l1(cfg, 0.5)(
            jnp.asarray(flow), None, jnp.asarray(occ),
            tuple(map(jnp.asarray, warped)), jnp.asarray(target)))
        want = np_ssim_forward(flow, None, occ, warped, target, cfg, 0.5,
                               occlusion_aware=False)
        assert got == pytest.approx(want, rel=2e-5)

    @pytest.mark.parametrize("past_flow", [False, True])
    def test_ossim_forward_vs_oracle(self, past_flow):
        cfg = PhotoConfig(frames=3, alpha=0.85, past_flow=past_flow)
        flow, flow_past, occ, warped, target = make_group(seed=22)
        fp = flow_past if past_flow else None
        got = float(make_ossim_l1(cfg, 0.7)(
            jnp.asarray(flow), None if fp is None else jnp.asarray(fp),
            jnp.asarray(occ), tuple(map(jnp.asarray, warped)),
            jnp.asarray(target)))
        want = np_ssim_forward(flow, flow_past if past_flow else None, occ,
                               warped, target, cfg, 0.7,
                               occlusion_aware=True)
        assert got == pytest.approx(want, rel=2e-5)

    def test_mssim_backward_vs_oracle(self):
        """Independent transcription of MSSIML1Criterion.lua:155-263
        updateGradInput for the warped-image gradients: center-gaussian-
        weight SSIM derivative approximation, L1 penalty derivative on the
        normalized diff, out-of-image masking, 1/(C(F-1)) + sizeAverage
        normalization — and NO 1/(mx-mn) chain factor."""
        cfg = PhotoConfig(frames=3, alpha=0.85)
        flow, _, occ, warped, target = make_group(seed=23)
        scale = 0.7
        fn = make_mssim_l1(cfg, scale)
        args = (jnp.asarray(flow), None, jnp.asarray(occ),
                tuple(map(jnp.asarray, warped)), jnp.asarray(target))
        got = jax.grad(lambda w_: fn(args[0], None, args[2], w_, args[4]))(
            args[3])

        b, h, w, c = target.shape
        k = gaussian3_kernel()
        gw = float(k[1, 1])
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        mx = max(float(v.max()) for v in (target, occ, *warped))
        mn = min(float(v.min()) for v in (target, occ, *warped))
        t = ((target - mn) / (mx - mn)).astype(np.float64)
        mu_y = np_gauss3(t, k)
        sigma_y = np_gauss3(t * t, k) - mu_y ** 2
        ref = 0.5 * (cfg.frames - 1)
        norm = 1.0 / (c * (cfg.frames - 1)) / (b * h * w)
        for f in range(1, cfg.frames):
            img = ((warped[f - 1] - mn) / (mx - mn)).astype(np.float64)
            mu_x = np_gauss3(img, k)
            sigma_x = np_gauss3(img * img, k) - mu_x ** 2
            sigma_xy = np_gauss3(img * t, k) - mu_x * mu_y
            l = (2 * mu_x * mu_y + C1) / (mu_x ** 2 + mu_y ** 2 + C1)
            cs = (2 * sigma_xy + C2) / (sigma_x + sigma_y + C2)
            d_l = 2 * gw * (mu_y - mu_x * l) / (mu_x ** 2 + mu_y ** 2 + C1)
            d_cs = 2 * gw * ((t - mu_y) - cs * (img - mu_x)) \
                / (sigma_x + sigma_y + C2)
            buf = img - t
            gi = (-cfg.alpha * (d_l * cs + l * d_cs)
                  + (1 - cfg.alpha) * buf / np.sqrt(buf ** 2 + 1e-6))
            disp = (f - ref - 1) * flow * scale if f <= ref \
                else (f - ref) * flow * scale
            gi = gi * np_mask(disp, h, w)[..., None] * norm
            np.testing.assert_allclose(np.asarray(got[f - 1]), gi,
                                       rtol=2e-4, atol=1e-8)

    def test_ossim_occ_backward_vs_oracle(self):
        """OSSIML1Criterion.lua:217-296: the occlusion gradient per frame
        is the frame's per-pixel loss (masked, plus the out-of-image
        penalty) added into channel 1 for past frames / channel 0 for
        future frames."""
        cfg = PhotoConfig(frames=3, alpha=0.85)
        flow, _, occ, warped, target = make_group(seed=24)
        scale = 0.7
        fn = make_ossim_l1(cfg, scale)
        got = np.asarray(jax.grad(
            lambda o: fn(jnp.asarray(flow), None, o,
                         tuple(map(jnp.asarray, warped)),
                         jnp.asarray(target)))(jnp.asarray(occ)))

        b, h, w, c = target.shape
        k = gaussian3_kernel()
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        mx = max(float(v.max()) for v in (target, *warped))
        mn = min(float(v.min()) for v in (target, *warped))
        t = ((target - mn) / (mx - mn)).astype(np.float64)
        mu_y = np_gauss3(t, k)
        sigma_y = np_gauss3(t * t, k) - mu_y ** 2
        ref = 0.5 * (cfg.frames - 1)
        norm = 1.0 / (c * (cfg.frames - 1)) / (b * h * w)
        want = np.zeros((b, h, w, 2))
        for f in range(1, cfg.frames):
            img = ((warped[f - 1] - mn) / (mx - mn)).astype(np.float64)
            mu_x = np_gauss3(img, k)
            sigma_x = np_gauss3(img * img, k) - mu_x ** 2
            sigma_xy = np_gauss3(img * t, k) - mu_x * mu_y
            l = (2 * mu_x * mu_y + C1) / (mu_x ** 2 + mu_y ** 2 + C1)
            cs = (2 * sigma_xy + C2) / (sigma_x + sigma_y + C2)
            buf = img - t
            per_pix = (cfg.alpha * (1 - l * cs).sum(-1)
                       + (1 - cfg.alpha) * np.sqrt(buf ** 2 + 1e-6).sum(-1))
            disp = (f - ref - 1) * flow * scale if f <= ref \
                else (f - ref) * flow * scale
            m = np_mask(disp, h, w)
            ch = 1 if f <= ref else 0
            want[..., ch] += (per_pix * m + (1 - m) * cfg.penalty_out) * norm
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-8)

    def test_gaussian_kernel_matches_torch_convention(self):
        k = gaussian3_kernel()
        g1 = np.exp(-((1 / 0.75) ** 2) / 2)
        expect = np.outer([g1, 1, g1], [g1, 1, g1])
        expect /= expect.sum()
        np.testing.assert_allclose(k, expect, rtol=1e-6)

    def test_mssim_normalization_includes_past_flow(self):
        """MSSIM's min/max normalization ranges over every input after
        the future flow — including the past flow when past_flow is on
        (MSSIML1Criterion.lua:62-68 loops i=2..#input, where input[2] is
        the past flow). A past-flow value outside the image-intensity
        range must therefore change the loss; the two cases below use a
        scale small enough that the out-of-image masks are identical."""
        cfg = PhotoConfig(frames=3, alpha=0.85, past_flow=True)
        flow, _, occ, warped, target = make_group(seed=11)
        fn = make_mssim_l1(cfg, 0.01)
        def run(fp_val):
            fp = np.full(flow.shape, fp_val, np.float32)
            return float(fn(jnp.asarray(flow), jnp.asarray(fp),
                            jnp.asarray(occ),
                            tuple(map(jnp.asarray, warped)),
                            jnp.asarray(target)))
        in_range, out_of_range = run(0.2), run(50.0)
        assert abs(in_range - out_of_range) > 1e-4, (in_range, out_of_range)

    def test_ssim_penalty_override_rule(self):
        """model.lua:189-193 swaps the SSIM family's L1 default only for
        -pme_penalty L1/Lorentzian; 'Quadratic' (the no-match case) keeps
        L1. So Lorentzian must change the loss and Quadratic must not."""
        flow, _, occ, warped, target = make_group(seed=3)
        args = (jnp.asarray(flow), None, jnp.asarray(occ),
                tuple(map(jnp.asarray, warped)), jnp.asarray(target))

        def run(penalty):
            cfg = PhotoConfig(frames=3, alpha=0.85, penalty=penalty)
            return float(make_mssim_l1(cfg, 0.05)(*args))

        l1, quad, lor = run("L1"), run("Quadratic"), run("Lorentzian")
        assert quad == l1
        assert abs(lor - l1) > 1e-5

    def test_ossim_runs_with_grads(self):
        cfg = PhotoConfig(frames=3, alpha=0.85)
        group = tuple(jnp.asarray(a) if not isinstance(a, tuple)
                      else tuple(map(jnp.asarray, a)) for a in make_group(seed=9))
        fn = make_ossim_l1(cfg, 1.0)
        val, grads = jax.value_and_grad(
            lambda o, wrp: fn(group[0], group[1], o, wrp, group[4]),
            argnums=(0, 1))(group[2], group[3])
        assert np.isfinite(float(val))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


class TestSmoothness:
    def test_constant_flow_zero(self):
        cfg = SmoothConfig(penalty="Quadratic")
        flow = jnp.ones((1, 5, 5, 2))
        target = jnp.asarray(arr((1, 5, 5, 3), seed=10))
        assert float(smoothness(flow, target, cfg)) == pytest.approx(0.0)

    def test_value_hand_computed(self):
        cfg = SmoothConfig(penalty="Quadratic", size_average=False)
        flow = np.zeros((1, 2, 2, 2), np.float32)
        flow[0, 0, 1, 0] = 1.0  # single x-step of 1 in u
        target = np.zeros((1, 2, 2, 3), np.float32)  # weights = exp(0) = 1
        # gx: u-diff at (0,0)=1, at (0,1)=0(border); also (1,*)=0
        # gy: u-diff at (0,1)= -1
        got = float(smoothness(jnp.asarray(flow), jnp.asarray(target), cfg))
        assert got == pytest.approx(2.0)

    def test_grad_matches_fd(self):
        cfg = SmoothConfig(penalty="L1")
        flow = arr((1, 5, 6, 2), seed=11)
        target = arr((1, 5, 6, 3), seed=12)

        def loss(f):
            return smoothness(f, jnp.asarray(target), cfg)

        d = np.asarray(jax.grad(loss)(jnp.asarray(flow)))
        eps = 1e-3
        for (y, x, ch) in [(2, 3, 0), (1, 1, 1), (4, 5, 0)]:
            fp = flow.copy(); fp[0, y, x, ch] += eps
            fm = flow.copy(); fm[0, y, x, ch] -= eps
            fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
            assert d[0, y, x, ch] == pytest.approx(fd, rel=1e-2, abs=1e-4)

    def test_second_order_grad_matches_fd(self):
        cfg = SmoothConfig(penalty="Quadratic", second_order=True)
        flow = arr((1, 5, 6, 2), seed=13)
        target = arr((1, 5, 6, 3), seed=14)

        def loss(f):
            return second_order_smoothness(f, jnp.asarray(target), cfg)

        d = np.asarray(jax.grad(loss)(jnp.asarray(flow)))
        eps = 1e-3
        for (y, x, ch) in [(2, 3, 0), (1, 1, 1)]:
            fp = flow.copy(); fp[0, y, x, ch] += eps
            fm = flow.copy(); fm[0, y, x, ch] -= eps
            fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
            assert d[0, y, x, ch] == pytest.approx(fd, rel=1e-2, abs=1e-4)


class TestKL:
    def test_forward_vs_oracle(self):
        """Independent transcription of KLDivergenceCriterion.lua:33-73
        updateOutput: replication-pad, clamp below at eps=5e-2, symmetric
        KL between center and down/right neighbors weighted at the CENTER
        pixel by contrast-sensitive target-gradient weights, norm =
        C/nElement."""
        rng = np.random.default_rng(40)
        occ = rng.uniform(0.01, 0.99, (2, 6, 7, 2)).astype(np.float32)
        target = rng.random((2, 6, 7, 3)).astype(np.float32)
        b, h, w, c = occ.shape
        eps = 5e-2
        nz = np.maximum(np.pad(occ, ((0, 0), (1, 1), (1, 1), (0, 0)),
                               mode="edge"), eps).astype(np.float64)
        lg = np.log(nz)
        pc, lc = nz[:, 1:1 + h, 1:1 + w], lg[:, 1:1 + h, 1:1 + w]
        pd, ld = nz[:, 2:2 + h, 1:1 + w], lg[:, 2:2 + h, 1:1 + w]
        pr, lr = nz[:, 1:1 + h, 2:2 + w], lg[:, 1:1 + h, 2:2 + w]
        gy = (lc - ld) * pc + (ld - lc) * pd
        gx = (lc - lr) * pc + (lr - lc) * pr
        t64 = target.astype(np.float64)
        igy = np.zeros((b, h, w)); igx = np.zeros((b, h, w))
        igy[:, :-1] = np.abs(t64[:, 1:] - t64[:, :-1]).mean(-1)
        igx[:, :, :-1] = np.abs(t64[:, :, 1:] - t64[:, :, :-1]).mean(-1)
        wy = np.exp(-20.0 * igy)[..., None]
        wx = np.exp(-20.0 * igx)[..., None]
        want = (gx * wx + gy * wy).sum() * c / occ.size

        kl = make_kl_smoothness(True, True)
        got = float(kl(jnp.asarray(occ), jnp.asarray(target)))
        assert got == pytest.approx(want, rel=2e-5)

    def test_uniform_occ_zero(self):
        kl = make_kl_smoothness(True, True)
        occ = jnp.full((1, 5, 5, 2), 0.5)
        target = jnp.asarray(arr((1, 5, 5, 3), seed=15))
        assert float(kl(occ, target)) == pytest.approx(0.0, abs=1e-6)

    def test_grad_matches_fd_away_from_clamp(self):
        kl = make_kl_smoothness(True, True)
        rng = np.random.default_rng(16)
        occ = rng.uniform(0.2, 0.8, (1, 5, 5, 2)).astype(np.float32)
        target = arr((1, 5, 5, 3), seed=17)

        def loss(o):
            return kl(o, jnp.asarray(target))

        d = np.asarray(jax.grad(loss)(jnp.asarray(occ)))
        eps = 1e-3
        for (y, x, ch) in [(2, 2, 0), (1, 3, 1), (0, 0, 0), (4, 4, 1)]:
            op = occ.copy(); op[0, y, x, ch] += eps
            om = occ.copy(); om[0, y, x, ch] -= eps
            fd = (float(loss(jnp.asarray(op))) - float(loss(jnp.asarray(om)))) / (2 * eps)
            assert d[0, y, x, ch] == pytest.approx(fd, rel=2e-2, abs=1e-4)


class TestOccPrior:
    def test_forward_value(self):
        fn = make_occ_prior(False, 1.0, True)
        occ = jnp.full((1, 3, 3, 2), 0.5)
        target = jnp.zeros((1, 3, 3, 3))
        # 1 - 0.25 per pixel * 9
        assert float(fn(occ, target)) == pytest.approx(0.75 * 9)

    def test_pseudo_gradient(self):
        """Reference grad is (1-o2, 1-o1), NOT the analytic (-o2, -o1)."""
        fn = make_occ_prior(False, 1.0, True)
        occ = np.asarray([[[[0.3, 0.9]]]], np.float32)
        target = jnp.zeros((1, 1, 1, 3))
        d = np.asarray(jax.grad(lambda o: fn(o, target))(jnp.asarray(occ)))
        np.testing.assert_allclose(d[0, 0, 0], [1 - 0.9, 1 - 0.3], atol=1e-6)

    def test_autodiff_mode_analytic(self):
        fn = make_occ_prior(False, 1.0, False)
        occ = np.asarray([[[[0.3, 0.9]]]], np.float32)
        target = jnp.zeros((1, 1, 1, 3))
        d = np.asarray(jax.grad(lambda o: fn(o, target))(jnp.asarray(occ)))
        np.testing.assert_allclose(d[0, 0, 0], [-0.9, -0.3], atol=1e-6)


class TestConstVel:
    def test_forward_epe(self):
        fn = make_const_vel(False, True)
        a = jnp.zeros((1, 2, 2, 2))
        b = jnp.ones((1, 2, 2, 2))
        assert float(fn(a, b)) == pytest.approx(np.sqrt(2.0) * 4)

    def test_backward_factor2_quirk(self):
        """size_average: forward /nElement but backward /npixels -> custom
        grad is exactly 2x the autodiff grad (ConstVelCriterion.lua:33,56)."""
        fa = arr((1, 4, 4, 2), seed=18)
        fb = arr((1, 4, 4, 2), seed=19)
        ref = make_const_vel(True, True)
        auto = make_const_vel(True, False)
        d_ref = np.asarray(jax.grad(lambda a: ref(a, jnp.asarray(fb)))(jnp.asarray(fa)))
        d_auto = np.asarray(jax.grad(lambda a: auto(a, jnp.asarray(fb)))(jnp.asarray(fa)))
        np.testing.assert_allclose(d_ref, 2.0 * d_auto, rtol=1e-4)


class TestL2:
    def test_forward_and_map(self):
        fn = make_l2_criterion(True, True)
        flow = np.zeros((1, 2, 2, 2), np.float32)
        gt = np.zeros((1, 2, 2, 2), np.float32)
        gt[0, 0, 0] = [3.0, 4.0]
        mask = np.ones((1, 2, 2), np.float32)
        loss, emap = fn(jnp.asarray(flow), jnp.asarray(gt), jnp.asarray(mask))
        assert float(loss) == pytest.approx(5.0 / 4.0)
        assert np.asarray(emap)[0, 0, 0] == pytest.approx(5.0)

    def test_mask_zeroes(self):
        fn = make_l2_criterion(True, True)
        flow = arr((1, 3, 3, 2), seed=20)
        gt = arr((1, 3, 3, 2), seed=21)
        mask = np.zeros((1, 3, 3), np.float32)
        mask[0, 1, 1] = 1.0
        loss, emap = fn(jnp.asarray(flow), jnp.asarray(gt), jnp.asarray(mask))
        expect = np.sqrt(((flow - gt)[0, 1, 1] ** 2).sum())
        assert float(loss) == pytest.approx(expect, rel=1e-5)

    def test_grad_matches_fd(self):
        fn = make_l2_criterion(True, True)
        flow = arr((1, 3, 4, 2), seed=22)
        gt = arr((1, 3, 4, 2), seed=23)
        mask = (np.random.default_rng(24).random((1, 3, 4)) > 0.3).astype(np.float32)

        def loss(f):
            return fn(f, jnp.asarray(gt), jnp.asarray(mask))[0]

        d = np.asarray(jax.grad(loss)(jnp.asarray(flow)))
        eps = 1e-3
        for (y, x, ch) in [(1, 1, 0), (2, 3, 1)]:
            fp = flow.copy(); fp[0, y, x, ch] += eps
            fm = flow.copy(); fm[0, y, x, ch] -= eps
            fd = (float(loss(jnp.asarray(fp))) - float(loss(jnp.asarray(fm)))) / (2 * eps)
            assert d[0, y, x, ch] == pytest.approx(fd, rel=1e-2, abs=1e-4)
