"""Zoo throughput: frames/sec/chip for any encoder name.

  python scripts/bench_zoo.py --names mae_base,clip_vit --batch_size 256

Same methodology as bench.py (chained iterations, host-fetch fence —
block_until_ready is a no-op through the axon tunnel)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _int8_apply_fn(name, params):
    """W8A8 serving body for the quantizable zoo members — the family
    dispatch lives in registry.int8_serving_fns (single source of
    truth with ShardedEmbedder)."""
    from pvr_habitat_tpu.models.registry import int8_serving_fns

    quantize_params, apply_q = int8_serving_fns(name)
    return quantize_params(params), apply_q


def bench_one(name, batch_size, iters, warmup, dtype=jnp.bfloat16,
              int8=False):
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    handle = build_encoder(name, pretrained=False)
    params = handle.params
    if any(k.endswith(".running_mean") for k in params):
        params = fold_resnet_bn(params)

    if int8:
        params_q, apply_q = _int8_apply_fn(name, params)
        params_q = jax.device_put(params_q)
        calib = jnp.asarray(np.random.RandomState(1).randint(
            0, 256, size=(32, 64, 64, 3), dtype=np.uint8))

        @jax.jit
        def calibrate(p, frames):
            x = handle.preprocess(frames,
                                  precision=jax.lax.Precision.DEFAULT,
                                  out_dtype=jnp.bfloat16)
            return apply_q(p, x, None)[1]

        scales = {k: float(v)
                  for k, v in calibrate(params_q, calib).items()}

        @jax.jit
        def forward(p, frames):
            x = handle.preprocess(frames,
                                  precision=jax.lax.Precision.DEFAULT,
                                  out_dtype=jnp.bfloat16)
            out, _ = apply_q(p, x, scales)
            return out.reshape(out.shape[0], -1).astype(jnp.float32)

        params = params_q
    else:
        params = jax.device_put(
            jax.tree.map(lambda x: x.astype(dtype)
                         if x.dtype == jnp.float32 else x, params))

        @jax.jit
        def forward(p, frames):
            x = handle.preprocess(frames,
                                  precision=jax.lax.Precision.DEFAULT,
                                  out_dtype=dtype)
            out = handle.apply_fn(p, x, train=False)
            return out.reshape(out.shape[0], -1).astype(jnp.float32)

    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch_size, 64, 64, 3), dtype=np.uint8))

    def sync(x):
        return float(jnp.sum(x))

    for _ in range(warmup):
        out = forward(params, frames)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = forward(params, frames)
    sync(out)
    elapsed = time.perf_counter() - start
    return batch_size * iters / elapsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--names", type=str, default="mae_base")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--int8", action="store_true",
                        help="W8A8 serving path (ResNet families, "
                             "clip_rn50, mae_*; the ViT int8 path is a "
                             "documented negative result).")
    args = parser.parse_args()
    for name in args.names.split(","):
        fps = bench_one(name, args.batch_size, args.iters, args.warmup,
                        int8=args.int8)
        print(json.dumps({"encoder": name, "frames_per_sec": round(fps, 1),
                          "batch_size": args.batch_size,
                          "path": "int8" if args.int8 else "bf16"}))


if __name__ == "__main__":
    main()
