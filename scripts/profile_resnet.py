"""On-device ResNet-50 stage profiling with tunnel-safe timing.

Per AXON tunnel behavior: block_until_ready is a no-op and each dispatch
has a ~3ms host-side floor, so every measurement chains `--iters`
dispatches and fences with one host fetch; the per-iter floor is
reported separately (measured with a no-op) so device time can be read
off.

Usage: python scripts/profile_resnet.py [--batch 256] [--iters 50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, *args, iters=50):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--fused", action="store_true",
                        help="Also profile the Pallas fused path.")
    parser.add_argument("--roofline", action="store_true",
                        help="Per-stage roofline: XLA cost_analysis "
                             "FLOPs/bytes vs measured time vs v5e peaks.")
    parser.add_argument("--peak_tflops", type=float, default=197.0,
                        help="bf16 peak (v5e: 197 TFLOPS).")
    parser.add_argument("--peak_gbps", type=float, default=819.0,
                        help="HBM bandwidth peak (v5e: 819 GB/s).")
    args = parser.parse_args()

    from pvr_habitat_tpu.models import common as cm
    from pvr_habitat_tpu.models import resnet
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    handle = build_encoder("resnet50", pretrained=False)
    spec = resnet.ResNetSpec(50)
    params = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), fold_resnet_bn(handle.params)))
    bs = args.batch
    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (bs, 64, 64, 3), np.uint8))

    # dispatch floor
    tiny = jnp.ones((8, 128), jnp.bfloat16)
    floor = timed(jax.jit(lambda a: a + 1), tiny, iters=args.iters)
    print(f"dispatch floor: {floor:.3f} ms/iter")

    pre = jax.jit(lambda f: handle.preprocess(
        f, precision=jax.lax.Precision.DEFAULT, out_dtype=jnp.bfloat16))
    x224 = pre(frames)
    fence(x224)
    print(f"preprocess: {timed(pre, frames, iters=args.iters):.2f} ms")

    def stem(p, x):
        y = cm.conv2d(x, p["conv1.weight"], stride=2, padding=3)
        y = jnp.maximum(cm.batch_norm(y, p, "bn1"), 0)
        return cm.max_pool(y, 3, 2, 1)

    stages = {"stem": jax.jit(stem)}
    for i in (1, 2, 3, 4):
        stages[f"layer{i}"] = jax.jit(
            lambda p, x, _i=i: resnet._stage(x, p, f"layer{_i}", spec,
                                             _i - 1, False))
    def costs(fn, *fn_args):
        """XLA's own per-executable cost model (flops, bytes).  ``fn``
        is already a jitted object — lower it directly (re-wrapping in
        jax.jit would recompile the stage, 20-60s each through the
        tunnel)."""
        try:
            ca = fn.lower(*fn_args).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", 0.0)), \
                float(ca.get("bytes accessed", 0.0))
        except Exception:  # noqa: BLE001 — cost model is best-effort
            return 0.0, 0.0

    if args.roofline:
        print(f"{'stage':8} {'ms':>7} {'GFLOP':>8} {'MB':>8} "
              f"{'%MXU':>6} {'%HBM':>6}  bound")
    y = x224
    for name, fn in stages.items():
        ms = timed(fn, params, y, iters=args.iters)
        if args.roofline:
            flops, nbytes = costs(fn, params, y)
            pct_mxu = flops / (ms / 1e3) / (args.peak_tflops * 1e12) * 100
            pct_hbm = nbytes / (ms / 1e3) / (args.peak_gbps * 1e9) * 100
            bound = "compute" if pct_mxu >= pct_hbm else "bandwidth"
            print(f"{name:8} {ms:7.2f} {flops / 1e9:8.1f} "
                  f"{nbytes / 1e6:8.1f} {pct_mxu:6.1f} {pct_hbm:6.1f}"
                  f"  {bound}")
        y = fn(params, y)
        fence(y)
        if not args.roofline:
            print(f"{name}: {ms:.2f} ms  (out {y.shape})")

    full = jax.jit(lambda p, f: handle.apply_fn(
        p, pre(f), train=False))
    ms = timed(full, params, frames, iters=args.iters)
    print(f"full XLA: {ms:.2f} ms -> {bs / ms * 1000:.0f} f/s")

    if args.fused:
        fused = jax.jit(lambda p, f: resnet.apply_fused(p, pre(f), spec))
        ms = timed(fused, params, frames, iters=args.iters)
        print(f"full fused: {ms:.2f} ms -> {bs / ms * 1000:.0f} f/s")
        from pvr_habitat_tpu.ops.pallas.fused_bottleneck import (
            block_weights, fused_bottleneck)

        y = stages["stem"](params, x224)
        fence(y)
        for blk, stride in (("layer1.0", 1), ("layer1.1", 1),
                            ("layer2.0", 2), ("layer2.1", 1)):
            w = block_weights(params, blk, dtype=jnp.bfloat16)
            fn = jax.jit(lambda x, _w=w, _s=stride: fused_bottleneck(
                x, *_w, stride=_s))
            ms = timed(fn, y, iters=args.iters)
            print(f"fused {blk} (s={stride}, in {y.shape}): {ms:.2f} ms")
            y = fn(y)   # feed this block's output to the next
            fence(y)


if __name__ == "__main__":
    main()
