"""Library inference API: `init(model) -> compute_flow(im1, im2, im3)`.

Mirrors the reference's library mode (back2future.lua:47-130):

  * images are stacked channel-wise and ImageNet-normalized,
  * W and H are rounded DOWN to a multiple of 64 (7 pyramid levels) and
    the stack bilinearly resized to that grid,
  * one jitted forward produces the finest-level flow and occlusion,
  * flow is nearest-resized back to the input size with u scaled by
    W/W64 and v by H/H64,
  * occlusions are thresholded at 0.6666 on the 2-channel softmax —
    channel 1 (index 0) past/backward, channel 2 (index 1)
    future/forward — then nearest-resized.

Units note (parity): the returned flow is in raw network units, exactly
like the reference — multiply by `flownet_factor` (20) for pixels.

Model resolution: `init()` accepts a checkpoint directory/file produced by
`back2future_tpu.train.checkpoint`, or a (params, config) pair, or `None`
for random weights (smoke tests). The reference's named pretrained models
(Ours-Hard / Ours-Soft-ft-KITTI / Ours-Soft-ft-Sintel) map to converted
checkpoints under `models/` when present.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Tuple

import numpy as np

from .data.augment import color_normalize
from .data.resample import resize

OCC_THRESHOLD = 0.6666  # back2future.lua:40

# Reference pretrained-name -> converted checkpoint path (back2future.lua:100-110)
PRETRAINED_PATHS = {
    "Ours-Hard": "models/RoamingImages_H",
    "Ours-Soft-ft-KITTI": "models/RoamingImages_H_KITTI_S",
    "Ours-Soft-ft-Sintel": "models/RoamingImages_H_Sintel_S",
}


def _round_down_64(x: int) -> int:
    return max(x - (x % 64), 64)


def _preprocess_triplets(frame_stacks, frames: int):
    """Shared compute_flow preprocessing (back2future.lua:48-71): stack,
    channel-concat, ImageNet-normalize, snap to the /64 grid.

    Returns (imgs (B, H64, W64, 3F) float32, n, height, width)."""
    if len(frame_stacks) != frames:
        raise ValueError(
            f"model expects {frames} frames, got {len(frame_stacks)} "
            f"image stacks")
    stacks = [np.stack([np.asarray(im, np.float32) for im in ims])
              if not isinstance(ims, np.ndarray) else
              np.asarray(ims, np.float32) for ims in frame_stacks]
    imgs = np.concatenate(stacks, axis=-1)          # (B, H, W, 3F)
    if imgs.shape[-1] != 3 * frames:
        raise ValueError(
            f"model expects {frames} frames "
            f"({3 * frames} channels), got {imgs.shape[-1]}")
    imgs = color_normalize(imgs)

    n, height, width = imgs.shape[:3]
    fine_h, fine_w = _round_down_64(height), _round_down_64(width)
    if (fine_h, fine_w) != (height, width):
        imgs = np.stack([resize(im, fine_h, fine_w, "bilinear")
                         for im in imgs])
    return imgs, n, height, width


def _postprocess_results(flow_b, occ_b, n: int, height: int, width: int):
    """Shared compute_flow postprocessing (back2future.lua:77-91): resize
    flow back with component rescale, threshold + resize occlusions.
    Models without an occlusion head (two-frame / no_occ) return
    all-False occlusion masks."""
    flow_b = np.asarray(flow_b, np.float32)[:n]
    sc_h = height / flow_b.shape[1]
    sc_w = width / flow_b.shape[2]
    flows = np.empty((n, height, width, 2), np.float32)
    fwd_occs = np.zeros((n, height, width), bool)
    bwd_occs = np.zeros((n, height, width), bool)
    occ_b = None if occ_b is None else np.asarray(occ_b, np.float32)[:n]
    for i in range(n):
        f = resize(flow_b[i], height, width, "simple")
        f[..., 0] *= sc_w
        f[..., 1] *= sc_h
        flows[i] = f
        if occ_b is None:
            continue
        fwd_occs[i] = resize(
            (occ_b[i, ..., 1] >= OCC_THRESHOLD).astype(np.float32),
            height, width, "simple") > 0.5
        bwd_occs[i] = resize(
            (occ_b[i, ..., 0] >= OCC_THRESHOLD).astype(np.float32),
            height, width, "simple") > 0.5
    return flows, fwd_occs, bwd_occs


class FlowEstimator:
    """Stateful wrapper owning the params and the compiled forward.

    Shape policy: inputs are snapped DOWN to the /64 grid
    (back2future.lua:54-71) and jax.jit specializes per full input
    shape — the executable bucket is (batch, H/64-cell, W/64-cell), so
    inputs sharing a 64x64 resolution cell AND a batch size share one
    compiled executable. A NEW bucket (a new resolution cell OR a new
    batch size) triggers a fresh XLA compile, which through the TPU
    relay takes minutes; serving streams should stick to fixed
    resolutions and batch sizes, or pre-compile their buckets up front
    with `warmup()`. A warning is emitted the first time a second
    bucket appears. The persistent compilation cache
    (utils/compile_cache.py, enabled by `init()`) makes each bucket's
    compile a once-per-machine cost rather than once-per-process.

    Scale-out (beyond the reference's single-GPU computeFlow): pass a
    `jax.sharding.Mesh` to serve on several chips — params are
    replicated, the batch is sharded over the mesh's 'data' axis, and
    with `spatial=True` (a mesh with a 'spatial' axis) image rows are
    sharded too, XLA inserting the halo exchanges — the same sharding
    contract the training step runs under (parallel/mesh.py)."""

    def __init__(self, params, config, dtype: str = "",
                 mesh=None, spatial: bool = False):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from .models.pwc import PWCNet
        from .parallel.mesh import replicate

        # serve-time compute-dtype override: a bf16-trained checkpoint can
        # be served in f32 (or vice versa) — params stay f32, only the
        # forward's compute dtype changes
        if dtype and dtype not in ("bfloat16", "float32"):
            raise ValueError(
                f"serving dtype override must be 'bfloat16' or 'float32', "
                f"got {dtype!r}")
        want = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(dtype)
        if want is not None and config.dtype != want:
            config = dataclasses.replace(config, dtype=want)
        self.config = config
        self.model = PWCNet(config)
        self.mesh = mesh
        self.spatial = spatial
        self.params = replicate(params, mesh) if mesh is not None else params
        self._jit = jax.jit(
            lambda p, x: self._finest(self.model.apply({"params": p}, x)))
        self._jit_video = jax.jit(self._video_forward)
        self._seen_buckets: set = set()
        self._in_warmup = False

    @staticmethod
    def _finest(outputs):
        g = outputs[0]
        return g["flow"], g["occ"]

    def _forward(self, x):
        if self.mesh is not None:
            from .parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh, spatial=self.spatial)
        bucket = x.shape[:3]  # (batch, H64, W64) — jit keys on all three
        if bucket not in self._seen_buckets:
            self._seen_buckets.add(bucket)
            if len(self._seen_buckets) > 1 and not self._in_warmup:
                import warnings

                warnings.warn(
                    f"compute_flow: new shape bucket (batch, H, W)="
                    f"{bucket} triggers a fresh XLA compile (minutes "
                    f"through the TPU relay; buckets seen so far: "
                    f"{sorted(self._seen_buckets)}). Keep resolutions AND "
                    f"batch sizes consistent or pre-compile with "
                    f"FlowEstimator.warmup().", stacklevel=3)
        return self._jit(self.params, x)

    def _padded_batch(self, n: int) -> int:
        """Batch size after mesh padding (compute_flow_batch pads up to a
        multiple of the 'data' axis so every batch is shardable)."""
        if self.mesh is None:
            return n
        data_n = self.mesh.shape.get("data", 1)
        return n + (-n) % data_n

    def warmup(self, sizes) -> None:
        """Pre-compile executables for `sizes`, each ``(height, width)``
        or ``(batch, height, width)`` (raw input resolutions, snapped
        down to the /64 grid like compute_flow; batch defaults to 1).
        Warm every (batch, resolution) combination the serving stream
        will use — jit specializes on batch size too."""
        import jax
        import jax.numpy as jnp

        self._in_warmup = True  # deliberate multi-bucket compiles: no
        try:                    # "pre-compile with warmup()" warnings
            for size in sizes:
                b, (h, w) = (1, size) if len(size) == 2 else (size[0], size[1:])
                x = jnp.zeros((self._padded_batch(b), _round_down_64(h),
                               _round_down_64(w), 3 * self.config.frames),
                              jnp.float32)
                jax.block_until_ready(self._forward(x))
        finally:
            self._in_warmup = False

    def __call__(self, *ims: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """compute_flow (back2future.lua:47-95): one (H, W, 3) image in
        [0,1] per model frame — (im1, im2, im3) for the flagship 3-frame
        models, (im1, im2) for two-frame ones, five for F=5.

        Returns (flow (H,W,2) float32 raw network units,
                 fwd_occ (H,W) bool, bwd_occ (H,W) bool).
        """
        flows, fwd_occs, bwd_occs = self.compute_flow_batch(
            *(np.asarray(im, np.float32)[None] for im in ims))
        return flows[0], fwd_occs[0], bwd_occs[0]

    def compute_flow_batch(self, *frame_stacks
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched compute_flow — beyond the reference's one-triplet
        computeFlow: one argument per model frame, each (B, H, W, 3) (or
        a list of (H, W, 3) images), all the same resolution, values in
        [0,1]. One jitted forward serves the whole batch — the throughput
        mode the benchmarks run in (bench.py: the single-triplet path
        leaves >10x on the table at serving scale). On a mesh the batch
        is padded up to a multiple of the 'data' axis (replicating the
        last sample; padding is trimmed from the results).

        Returns (flows (B,H,W,2) float32 raw network units,
                 fwd_occs (B,H,W) bool, bwd_occs (B,H,W) bool)."""
        import jax.numpy as jnp

        imgs, n, height, width = _preprocess_triplets(
            frame_stacks, self.config.frames)

        pad = self._padded_batch(n) - n
        if pad:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], pad, axis=0)])

        flow_d, occ_d = self._forward(jnp.asarray(imgs))
        return _postprocess_results(flow_d, occ_d, n, height, width)


    def _video_forward(self, p, frames_n):
        """Jitted streaming forward: pyramid once per frame, one batched
        decode over all sliding windows from sliced pyramids."""
        import jax.numpy as jnp

        F = self.config.frames
        w = frames_n.shape[0] - F + 1
        cs_all = self.model.apply({"params": p}, frames_n, method="pyramid")
        cs = {f: {l: feat[f - 1: f - 1 + w] for l, feat in cs_all.items()}
              for f in range(1, F + 1)}
        x = jnp.concatenate(
            [frames_n[f - 1: f - 1 + w] for f in range(1, F + 1)], axis=-1)
        return self._finest(
            self.model.apply({"params": p}, x, cs, method="from_pyramids"))

    def compute_flow_video(self, frames
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Streaming video inference — beyond the reference's per-triplet
        computeFlow: `frames` is a whole (N, H, W, 3) sequence in [0,1]
        (or a list of (H, W, 3) images), N >= the model's frame count F.
        Computes results for all N-F+1 sliding F-frame windows, each
        identical in math to compute_flow on that window's frames — but
        each frame's siamese feature pyramid runs ONCE instead of once
        per window: the extractor convs drop from F*(N-F+1) to N
        frame-runs (~3x less pyramid work for F=3 on long sequences) and
        every window decodes in one batched forward whose per-frame
        features are slices of the shared N-frame pyramid.

        Returns (flows (N-F+1, H, W, 2) float32 raw network units,
        fwd_occs, bwd_occs (N-F+1, H, W) bool); window t covers
        frames[t:t+F] with flow at its reference (center) frame.

        jit specializes per (N, H64, W64) — stream fixed-length chunks at
        a fixed resolution, exactly like the batch path's buckets.
        """
        import jax.numpy as jnp

        F = self.config.frames
        if self.mesh is not None:
            raise ValueError(
                "compute_flow_video is single-device (the window batch is "
                "coupled across frames); shard a workload by scene/chunk "
                "across chips instead, one estimator each")
        arr = (np.asarray(frames, np.float32) if isinstance(frames, np.ndarray)
               else np.stack([np.asarray(f, np.float32) for f in frames]))
        if arr.ndim != 4 or arr.shape[-1] != 3:
            raise ValueError(
                f"expected (N, H, W, 3) video frames, got {arr.shape}")
        if arr.shape[0] < F:
            raise ValueError(
                f"need at least frames={F} video frames, got {arr.shape[0]}")
        arr = color_normalize(arr)
        n, height, width = arr.shape[:3]
        fine_h, fine_w = _round_down_64(height), _round_down_64(width)
        if (fine_h, fine_w) != (height, width):
            arr = np.stack([resize(im, fine_h, fine_w, "bilinear")
                            for im in arr])

        bucket = ("video", n, fine_h, fine_w)
        if bucket not in self._seen_buckets:
            self._seen_buckets.add(bucket)
            if len(self._seen_buckets) > 1 and not self._in_warmup:
                import warnings

                warnings.warn(
                    f"compute_flow_video: new shape bucket (N, H, W)="
                    f"{bucket[1:]} triggers a fresh XLA compile (minutes "
                    f"through the TPU relay). Stream fixed-length chunks "
                    f"at a fixed resolution.", stacklevel=2)

        flow_d, occ_d = self._jit_video(self.params, jnp.asarray(arr))
        return _postprocess_results(
            flow_d, occ_d, n - F + 1, height, width)

    def export(self, path, sizes) -> None:
        """AOT serving export: serialize the jitted forward (params baked
        in as constants) for each `sizes` bucket — ``(height, width)`` or
        ``(batch, height, width)`` like warmup() — into a self-contained
        artifact directory loadable with `load_exported()`.

        The artifact is jax.export StableHLO: a serving process needs no
        model code, no checkpoint, and no re-trace — deserialization plus
        one (persistently cached) XLA compile per bucket. Exports are
        platform-checked at load (an artifact exported under TPU will
        refuse to run on CPU and vice versa). Going beyond the reference,
        whose serving story is torch.load of the full .t7 graph
        (back2future.lua:113-116). Mesh-sharded estimators are not
        exportable (replicate the artifact per chip instead)."""
        import json

        import jax
        from jax import export as jexport

        if self.mesh is not None:
            raise ValueError("export() supports single-device estimators; "
                             "serve a mesh by loading the artifact once "
                             "per chip")
        out = Path(path)
        out.mkdir(parents=True, exist_ok=True)
        fn = jax.jit(lambda x: self._finest(
            self.model.apply({"params": self.params}, x)))
        buckets = []
        for size in sizes:
            b, (h, w) = (1, size) if len(size) == 2 else (size[0], size[1:])
            h64, w64 = _round_down_64(h), _round_down_64(w)
            spec = jax.ShapeDtypeStruct(
                (b, h64, w64, 3 * self.config.frames), jax.numpy.float32)
            exp = jexport.export(fn)(spec)
            name = f"forward_{b}x{h64}x{w64}.stablehlo"
            (out / name).write_bytes(exp.serialize())
            buckets.append([b, h64, w64])
        (out / "meta.json").write_text(json.dumps({
            "format": "back2future_tpu.export.v1",
            "frames": self.config.frames,
            "buckets": buckets,
            "platforms": [jax.default_backend()],
            "jax_version": jax.__version__,
        }, indent=1))


class ExportedFlowEstimator:
    """compute_flow over a `FlowEstimator.export()` artifact: identical
    pre/post-processing, but the forward comes from deserialized
    StableHLO — no model code, params, or tracing in the serving
    process. Only exported (batch, height, width) buckets are callable;
    anything else raises (there are no params to fall back on)."""

    def __init__(self, path):
        import json

        self.path = Path(path)
        meta = json.loads((self.path / "meta.json").read_text())
        if meta.get("format") != "back2future_tpu.export.v1":
            raise ValueError(f"{path}: not a back2future_tpu export "
                             f"artifact (format={meta.get('format')!r})")
        self.frames = int(meta["frames"])
        self.buckets = {tuple(b) for b in map(tuple, meta["buckets"])}
        self.platforms = meta.get("platforms", [])
        if self.platforms:  # refuse at load, not deep in the first call
            import jax

            backend = jax.default_backend()
            if backend not in self.platforms:
                raise ValueError(
                    f"{path}: exported for platform(s) {self.platforms}, "
                    f"but this process's JAX backend is {backend!r} — "
                    f"re-export on the serving platform")
        self._fns: dict = {}

    def _forward(self, imgs):
        import jax.numpy as jnp
        from jax import export as jexport

        bucket = imgs.shape[:3]
        if bucket not in self.buckets:
            raise ValueError(
                f"no exported executable for (batch, H, W)={bucket}; "
                f"artifact has {sorted(self.buckets)} — re-export with "
                f"this bucket in `sizes`")
        fn = self._fns.get(bucket)
        if fn is None:
            b, h, w = bucket
            blob = (self.path / f"forward_{b}x{h}x{w}.stablehlo").read_bytes()
            fn = self._fns[bucket] = jexport.deserialize(blob)
        return fn.call(jnp.asarray(imgs))

    def __call__(self, *ims):
        flows, fwd_occs, bwd_occs = self.compute_flow_batch(
            *(np.asarray(im, np.float32)[None] for im in ims))
        return flows[0], fwd_occs[0], bwd_occs[0]

    def compute_flow_batch(self, *frame_stacks):
        imgs, n, height, width = _preprocess_triplets(
            frame_stacks, self.frames)
        flow_d, occ_d = self._forward(imgs)
        return _postprocess_results(flow_d, occ_d, n, height, width)


def load_exported(path) -> ExportedFlowEstimator:
    """Open an AOT serving artifact written by `FlowEstimator.export()`."""
    from .utils import enable_compile_cache

    enable_compile_cache()
    return ExportedFlowEstimator(path)


def init(model: Optional[object] = "Ours-Soft-ft-KITTI",
         dtype: str = "", mesh=None, spatial: bool = False
         ) -> Callable:
    """Load a model and return its compute_flow callable
    (back2future.lua:97-129).

    `model` may be:
      * a reference pretrained name ("Ours-Hard", "Ours-Soft-ft-KITTI",
        "Ours-Soft-ft-Sintel") resolving to a converted checkpoint,
      * a checkpoint path (directory or file),
      * a (params, PWCConfig) tuple,
      * None -> random weights (hard 3-frame default; smoke testing).

    `dtype` ("bfloat16" / "float32") overrides the serving compute dtype;
    default: the checkpoint's own config (bfloat16 for random weights).
    """
    import jax
    import jax.numpy as jnp

    from .models.pwc import PWCConfig, PWCNet
    from .utils import enable_compile_cache

    enable_compile_cache()

    if isinstance(model, tuple):
        params, config = model
        return FlowEstimator(params, config, dtype, mesh, spatial)

    if model is None:
        config = PWCConfig(dtype=jnp.float32 if dtype == "float32"
                           else jnp.bfloat16)
        net = PWCNet(config)
        params = jax.jit(net.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 128, 3 * config.frames)))["params"]
        return FlowEstimator(params, config, dtype, mesh, spatial)

    path = PRETRAINED_PATHS.get(str(model), str(model))
    if not Path(path).exists():
        raise FileNotFoundError(
            f"no checkpoint at {path!r} (for reference pretrained names, "
            f"convert the .t7 with tools/convert_t7.py first)")
    from .train.checkpoint import load_model_checkpoint

    params, config = load_model_checkpoint(path)
    if not isinstance(config, PWCConfig):
        # the API serves the PWC family, like the reference's computeFlow
        # (back2future.lua:97-129); other netTypes eval via tools/eval.py
        raise ValueError(
            f"checkpoint at {path!r} was trained with netType="
            f"{type(config).__name__}; load() serves the PWC family only")
    return FlowEstimator(params, config, dtype, mesh, spatial)
