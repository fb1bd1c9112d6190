"""Headline benchmark: ResNet-50 frame-embedding throughput per chip.

Measures the bulk-embedding hot path (BASELINE.md target: >= 10,000
frames/sec/chip on v5e): uint8 64x64 frames -> fused matmul-resize
preprocess -> BN-folded ResNet-50 -> 2048-d embeddings.

Default path: W8A8 int8 serving (pure XLA, no Pallas — driver-safe),
certified by an accuracy gate on real FakeNav data
(tests/test_quantize.py::test_int8_bench_gate_on_fakenav_data:
embedding cosine > 0.99 vs f32 AND downstream BC training-loss parity
within 10%).  ``--fused off`` is the bf16 parity-grade path.

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
    preprocess = handle.preprocess
    spec = resnet.ResNetSpec(50)

    if fused == "int8":
        # W8A8 opt-in fast path: calibrate activation scales on one
        # batch, then serve with static scales.
        from pvr_habitat_tpu.ops import quantize as q

        params_q = jax.device_put(q.quantize_resnet_params(params))
        calib = jnp.asarray(np.random.RandomState(1).randint(
            0, 256, size=(32, 64, 64, 3), dtype=np.uint8))
        x = preprocess(calib, precision=jax.lax.Precision.DEFAULT,
                       out_dtype=jnp.bfloat16)
        _, scales = resnet.apply_int8(params_q, x, spec)
        scales = {k: float(v) for k, v in scales.items()}

        @jax.jit
        def forward_q(params, frames):
            x = preprocess(frames, precision=jax.lax.Precision.DEFAULT,
                           out_dtype=jnp.bfloat16)
            out, _ = resnet.apply_int8(params, x, spec, scales=scales)
            return out

        frames = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, size=(batch_size, 64, 64, 3), dtype=np.uint8))
        return forward_q, params_q, frames

    params = jax.device_put(
        jax.tree.map(lambda x: x.astype(dtype), params))
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
    parser.add_argument("--fused",
                        choices=["off", "v1", "v2", "hybrid", "int8"],
                        default="int8",
                        help="Compute path. Default int8 = W8A8 XLA "
                             "serving (accuracy-gated, see module "
                             "docstring); off = bf16 parity-grade path; "
                             "v1/v2/hybrid = Pallas fused-bottleneck "
                             "experiments (lose to XLA, kept for A/B).")
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
        "path": args.fused,
    }))


if __name__ == "__main__":
    main()
