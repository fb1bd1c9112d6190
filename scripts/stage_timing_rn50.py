"""MEASURED per-stage / per-boundary decomposition of the bf16
ResNet-50 embedding path (the `--fused off` parity path), to pair with
the analytic floors in scripts/roofline_rn50.py.

VERDICT r3 item 6: the summed per-stage slack between the measured
21 ms and the 15.1 ms mixed-roofline floor (~25%) was unattributed.
This script times PREFIXES of the exact bench pipeline (preprocess,
+stem, +layer1..4, +avgpool) with K chained iterations inside one jit
(the tunnel's dispatch floor and `block_until_ready` no-op make
single-call timings meaningless — memory/axon-tpu-tunnel-quirks.md),
then differences adjacent prefixes to attribute per-stage cost
INCLUDING its input-boundary materialization.

Methodology note: each prefix ends in a full reduction (sum) so XLA
cannot dead-code the stage, and the scan carries only that scalar, so
iteration i+1's input depends on iteration i (no CSE across
iterations).  The terminal sum can fuse into the last stage's
epilogue, so a prefix may avoid the final WRITE of its cut tensor;
that write is then charged to the NEXT stage's delta — boundary costs
stay inside the pair being differenced, never lost.

Also A/Bs preprocess arrangements (the worst relative slack in the
round-3 table: 1.6 ms measured vs 0.15 ms floor):
  - `einsum`: resize as the production two-einsum form (ops/image.py)
  - `nonorm`: same minus quantize_uint8+normalize (isolates epilogue)
  - `gemm`:   explicit transpose-to-one-big-GEMM per axis form

Run on the real chip:  python scripts/stage_timing_rn50.py [--batch 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.utils.platform import configure_platform  # noqa: E402

configure_platform()  # honor PVR_TPU_PLATFORM (cpu smoke-testing)


def chained_time(fn, frames, iters=20, warmup=2):
    """Median-of-3 wall time per iteration of fn chained K times."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(frames):
        def body(carry, _):
            # uint8-safe perturbation: carry is 0 or 1; adding it keeps
            # the pipeline's input dtype and forces serialization.
            out = fn(frames + carry)
            s = jnp.sum(out.astype(jnp.float32))
            # carry' in {0, 1}, data-dependent, never actually 1.
            nxt = (s != s).astype(frames.dtype)
            return nxt, s

        _, sums = lax.scan(body, jnp.zeros((), frames.dtype),
                           None, length=iters)
        return sums[-1]

    float(loop(frames))  # compile + warm
    for _ in range(warmup):
        float(loop(frames))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(frames))
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from pvr_habitat_tpu.models import resnet
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops import image
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    n = args.batch
    handle = build_encoder("resnet50", pretrained=False)
    params = fold_resnet_bn(handle.params)
    params = jax.jit(lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), p))(bench._device_init(params))
    preprocess = handle.preprocess
    spec = resnet.ResNetSpec(50)
    frames = bench._device_frames(n)

    def pre(x):
        return preprocess(x, precision=jax.lax.Precision.DEFAULT,
                          out_dtype=jnp.bfloat16)

    # Prefixes against the real apply internals (models/resnet.py).
    from pvr_habitat_tpu.models.resnet import _stage

    from pvr_habitat_tpu.models import common as cm

    def _stem_inline(p, y):
        # Exactly resnet.apply's stem (models/resnet.py:114-117).
        y = cm.conv2d(y, p["conv1.weight"], stride=2, padding=3)
        y = cm.batch_norm(y, p, "bn1", train=False)
        y = jnp.maximum(y, 0)
        return cm.max_pool(y, window=3, stride=2, padding=1)

    def make_prefix(k):
        def fn(x):
            y = pre(x)
            if k == 0:
                return y
            y = _stem_inline(params, y)
            for s in range(min(k - 1, 4)):
                y = _stage(y, params, f"layer{s + 1}", spec, s, False)
            if k == 6:
                y = jnp.mean(y, axis=(1, 2))
            return y
        return fn

    names = ["preprocess", "+stem+pool", "+layer1", "+layer2", "+layer3",
             "+layer4", "+avgpool(full)"]
    prev = 0.0
    print(f"batch {n}, {args.iters} chained iters, bf16, "
          f"devices={jax.devices()}")
    results = []
    for k, name in enumerate(names):
        t = chained_time(make_prefix(k), frames, iters=args.iters)
        results.append(t)
        print(f"{name:16} prefix {t * 1e3:7.2f} ms   "
              f"delta {(t - prev) * 1e3:7.2f} ms   "
              f"({n / t:,.0f} f/s prefix)", flush=True)
        prev = t

    # Preprocess arrangement A/B.
    print("\npreprocess A/B:")

    def pre_nonorm(x):
        w = x.astype(jnp.bfloat16)
        y = image.resize(w, (256, 256), "bilinear", False,
                         jax.lax.Precision.DEFAULT, crop=224)
        return y

    def pre_gemm(x):
        w = x.astype(jnp.bfloat16)
        wh = jnp.asarray(image.resize_matrix(64, 256), jnp.bfloat16)
        ww = wh
        top = (256 - 224) // 2
        wh, ww = wh[top:top + 224], ww[top:top + 224]
        nb, h, wdim, c = w.shape
        # rows: (h, n*w*c) GEMM
        y = wh @ w.transpose(1, 0, 2, 3).reshape(h, nb * wdim * c)
        y = y.reshape(224, nb, wdim, c)
        # cols: (w, n*224*c) GEMM
        y = ww @ y.transpose(2, 1, 0, 3).reshape(wdim, nb * 224 * c)
        y = y.reshape(224, nb, 224, c).transpose(1, 2, 0, 3)
        y = image.quantize_uint8(y)
        y = y / jnp.asarray(255.0, y.dtype)
        mean = jnp.asarray(image.IMAGENET_MEAN, y.dtype)
        std = jnp.asarray(image.IMAGENET_STD, y.dtype)
        return ((y - mean) / std).astype(jnp.bfloat16)

    for name, fn in (("einsum (prod)", pre),
                     ("einsum nonorm", pre_nonorm),
                     ("gemm", pre_gemm)):
        t = chained_time(fn, frames, iters=args.iters)
        print(f"  {name:16} {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
