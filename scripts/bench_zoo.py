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


def bench_one(name, batch_size, iters, warmup, dtype=jnp.bfloat16):
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    handle = build_encoder(name, pretrained=False)
    params = handle.params
    if any(k.endswith(".running_mean") for k in params):
        params = fold_resnet_bn(params)
    params = jax.device_put(
        jax.tree.map(lambda x: x.astype(dtype)
                     if x.dtype == jnp.float32 else x, params))

    @jax.jit
    def forward(p, frames):
        x = handle.preprocess(frames, precision=jax.lax.Precision.DEFAULT,
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
    args = parser.parse_args()
    for name in args.names.split(","):
        fps = bench_one(name, args.batch_size, args.iters, args.warmup)
        print(json.dumps({"encoder": name, "frames_per_sec": round(fps, 1),
                          "batch_size": args.batch_size}))


if __name__ == "__main__":
    main()
