"""Headline benchmark: ResNet-50 frame-embedding throughput per chip.

Measures the bulk-embedding hot path (BASELINE.md target: >= 10,000
frames/sec/chip on v5e): uint8 64x64 frames -> fused matmul-resize
preprocess -> BN-folded bf16 ResNet-50 -> 2048-d embeddings.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N/10000}
"""

import argparse
import json
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_FPS = 10000.0
WATCHDOG_SECONDS = 420


def _watchdog(signum, frame):
    # The axon tunnel can wedge (fetches hang forever). Emit a sentinel
    # line rather than hanging the driver.
    print(json.dumps({
        "metric": "resnet50_embed_fps_per_chip",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
        "note": "watchdog: TPU runtime did not respond",
    }))
    sys.stdout.flush()
    sys.exit(2)


def build_forward(batch_size, dtype=jnp.bfloat16, fused="off"):
    from pvr_habitat_tpu.models import resnet
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    handle = build_encoder("resnet50", pretrained=False)
    params = fold_resnet_bn(handle.params)
    params = jax.device_put(
        jax.tree.map(lambda x: x.astype(dtype), params))
    preprocess = handle.preprocess
    spec = resnet.ResNetSpec(50)
    body = {
        "off": handle.apply_fn,
        "v1": lambda p, x, train=False: resnet.apply_fused(p, x, spec),
        "v2": lambda p, x, train=False: resnet.apply_fused_v2(p, x, spec),
        "hybrid": lambda p, x, train=False: resnet.apply_fused_hybrid(
            p, x, spec),
    }[fused]

    @jax.jit
    def forward(params, frames):
        x = preprocess(frames, precision=jax.lax.Precision.DEFAULT,
                       out_dtype=dtype)
        return body(params, x, train=False)

    frames = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch_size, 64, 64, 3), dtype=np.uint8))
    return forward, params, frames


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--fused", choices=["off", "v1", "v2", "hybrid"],
                        default="off",
                        help="Pallas fused-bottleneck variants (off = "
                             "pure XLA, the default driver-safe path).")
    args = parser.parse_args()

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECONDS)

    forward, params, frames = build_forward(args.batch_size,
                                            fused=args.fused)

    def sync(x):
        # Device execution is serialized per chip, so fetching a scalar
        # of the LAST output drains the queue.  (block_until_ready is a
        # no-op through the axon tunnel, so an explicit host fetch is
        # the only reliable fence.)
        return float(jnp.sum(x.astype(jnp.float32)))

    for _ in range(args.warmup):
        out = forward(params, frames)
    sync(out)

    start = time.perf_counter()
    for _ in range(args.iters):
        out = forward(params, frames)
    sync(out)
    elapsed = time.perf_counter() - start

    fps = args.batch_size * args.iters / elapsed
    print(json.dumps({
        "metric": "resnet50_embed_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
