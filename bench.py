"""Headline benchmark: ResNet-50 frame-embedding throughput per chip.

Measures the bulk-embedding hot path (BASELINE.md target: >= 10,000
frames/sec/chip on v5e): uint8 64x64 frames -> fused matmul-resize
preprocess -> BN-folded ResNet-50 -> 2048-d embeddings.

Default path: W8A8 int8 serving (pure XLA, no Pallas — driver-safe),
certified by an accuracy gate on real FakeNav data
(tests/test_quantize.py::test_int8_bench_gate_on_fakenav_data:
embedding cosine > 0.99 vs f32 AND downstream BC training-loss parity
within 10%).  ``--fused off`` is the bf16 parity-grade path.

Resilience (the axon TPU tunnel wedges spontaneously — see
docs/DESIGN.md "Tunnel pathology"): the benchmark runs as a PARENT
SUPERVISOR that never initializes JAX, launching each measurement
attempt as a child subprocess.  Children emit per-phase telemetry to
stderr (``BENCHPHASE <name> +<t>s``) and carry per-phase SIGALRM
deadlines; the parent enforces a hard wall-clock kill per attempt AND
short init-phase kills (a child GIL-blocked in a wedged backend init
never fires its own alarm — round-3 failure mode), retries after a
cool-down when the tunnel looks wedged (wedges are terminal-side and
sometimes clear within a minute), falls back int8 -> bf16 when the
fancy path fails or after two wedge failures, persists the XLA
compilation cache across attempts/processes (a warm cache turns any
sub-minute healthy window into a capture), and ALWAYS prints exactly
one JSON line on stdout within the global budget:

  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N/10000}

On total failure the line carries value 0.0 and a note naming the last
phase each attempt reached — never a silent zero.

Manual tunnel health check: ``python bench.py --probe-only``.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_FPS = 10000.0
METRIC = "resnet50_embed_fps_per_chip"
PHASE_PREFIX = "BENCHPHASE"

# Per-phase deadlines (seconds) for the child, sized from measured
# tunnel behavior (memory/axon-tpu-tunnel-quirks.md): backend init +
# first tiny dispatch ~30 s when healthy, resnet50 compile 20-60 s per
# distinct shape through the tunnel.
PHASE_DEADLINES = {
    "backend_init": 90,
    # Generous: during marginal tunnel recovery the first fetch can
    # take >60 s and then succeed; killing it leaves an in-flight RPC
    # that renews the wedge for tens of minutes (observed 2026-08-17).
    "tiny_probe": 120,
    # The post-probe phases are bounded by the PARENT's attempt
    # deadline; these alarms exist for attribution, so they stay
    # generous — under marginal tunnel transport (~23 MB/s) the param
    # upload inside calibrate/build alone can take minutes.
    "build": 360,
    "calibrate": 600,
    "compile_warmup": 600,
    "timed_loop": 300,
}

# Child exit codes.
RC_OK = 0
RC_PHASE_TIMEOUT = 3

# Phases whose failure implies the tunnel (not the compute path) is sick.
WEDGE_PHASES = ("launch", "backend_init", "tiny_probe")

# PARENT-side per-phase kill limits for the early wedge phases.  The
# child's own SIGALRM cannot fire while it is blocked inside a C-level
# RPC holding the GIL (exactly what a wedged `jax.devices()` does), so
# round-3's attempt 1 sat 240 s in backend_init and burned the driver
# budget (BENCH_r03.json).  A healthy init is ~10 s; the parent kills a
# child lingering in these phases so a wedged attempt costs ~45 s and
# several attempts fit in one driver budget.
PARENT_PHASE_LIMITS = {"launch": 45.0, "backend_init": 45.0,
                       "tiny_probe": 75.0}

# Persistent XLA compilation cache shared across attempts/processes:
# calibrate+compile_warmup dominate a cold healthy run (~180 s under
# load); with a warm cache a sub-minute healthy tunnel window is enough
# to capture.  Overridable for tests via PVR_BENCH_CACHE_DIR.
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".xla_cache")


_SCALES_VERSION = 1  # bump when the calibration recipe changes


def _scales_recipe_digest():
    """Digest of the calibration recipe's inputs so drift (quantize or
    resnet source, this file, jax version) invalidates the cache
    automatically instead of serving stale scales (ADVICE r4).  Called
    only in the child, after jax is importable; importing jax does not
    initialize a backend."""
    import hashlib

    import jax

    from pvr_habitat_tpu.models import resnet
    from pvr_habitat_tpu.ops import quantize

    digest = hashlib.sha256(jax.__version__.encode())
    for source in (quantize.__file__, resnet.__file__,
                   os.path.abspath(__file__)):
        try:
            with open(source, "rb") as handle:
                digest.update(handle.read())
        except OSError:
            digest.update(b"?")
    return digest.hexdigest()[:12]


def _scales_cache_path():
    cache_dir = os.environ.get("PVR_BENCH_CACHE_DIR", DEFAULT_CACHE_DIR)
    return os.path.join(
        cache_dir,
        f"int8_scales_v{_SCALES_VERSION}_{_scales_recipe_digest()}.json")


def _load_cached_scales():
    try:
        with open(_scales_cache_path()) as handle:
            obj = json.load(handle)
        if not isinstance(obj, dict):
            return None
        return {k: float(v) for k, v in obj.items()}
    except Exception:
        # A corrupt/garbage cache degrades to recalibration, never to a
        # crashed calibrate phase (ADVICE r4).
        return None


def _store_cached_scales(scales):
    try:
        path = _scales_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".tmp", "w") as handle:
            json.dump(scales, handle)
        os.replace(path + ".tmp", path)
    except OSError:
        pass  # cache is an optimization, never fatal


def _emit(payload):
    print(json.dumps(payload))
    sys.stdout.flush()


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Child: one measurement attempt, with phase telemetry + per-phase alarms.
# ---------------------------------------------------------------------------

class _Phased:
    """Tracks the current phase; SIGALRM aborts with RC_PHASE_TIMEOUT."""

    def __init__(self):
        self.t0 = time.time()
        self.phase = "start"
        signal.signal(signal.SIGALRM, self._on_alarm)

    def _on_alarm(self, signum, frame):
        _log(f"{PHASE_PREFIX} TIMEOUT in phase={self.phase} "
             f"+{time.time() - self.t0:.1f}s")
        os._exit(RC_PHASE_TIMEOUT)

    def enter(self, name):
        self.phase = name
        _log(f"{PHASE_PREFIX} {name} +{time.time() - self.t0:.1f}s")
        signal.alarm(PHASE_DEADLINES.get(name, 120))

    def done(self):
        signal.alarm(0)
        _log(f"{PHASE_PREFIX} done +{time.time() - self.t0:.1f}s")


def _device_init(params_host):
    """Recreate the parameter pytree ON DEVICE from one PRNG key.

    A throughput bench needs realistic magnitudes, not trained values
    (MXU timing is data-independent), and uploading ~100 MB of host-
    initialized tensors through marginal tunnel transport (~23 MB/s)
    costs minutes; this makes the whole param setup one key upload +
    one compile."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    names_shapes = [(k, v.shape) for k, v in sorted(params_host.items())]
    sizes = [int(np.prod(s)) for _, s in names_shapes]
    total = int(np.sum(sizes))

    @jax.jit
    def init(key):
        # ONE rng expansion + per-leaf slices: a per-leaf normal() per
        # parameter (161 threefry expansions) compiles pathologically
        # slowly (~4 min on CPU).
        flat = 0.05 * jax.random.normal(key, (total,), jnp.float32)
        out, offset = {}, 0
        for (name, shape), size in zip(names_shapes, sizes):
            out[name] = jax.lax.dynamic_slice_in_dim(
                flat, offset, size).reshape(shape)
            offset += size
        return out

    return init(jax.random.PRNGKey(0))


def _device_frames(batch_size, seed=0):
    """Random uint8 frames generated on device (no h2d upload)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        x = jax.random.randint(key, (batch_size, 64, 64, 3), 0, 256,
                               jnp.int32)
        return x.astype(jnp.uint8)

    return gen(jax.random.PRNGKey(1000 + seed))


def build_forward(batch_size, dtype=None, fused="off"):
    """Build (forward, params, frames) for the requested compute path.

    Kept importable for scripts/tests that A/B paths directly.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pvr_habitat_tpu.models import resnet
    from pvr_habitat_tpu.models.registry import build_encoder
    from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

    dtype = dtype or jnp.bfloat16
    handle = build_encoder("resnet50", pretrained=False)
    params = fold_resnet_bn(handle.params)
    preprocess = handle.preprocess
    spec = resnet.ResNetSpec(50)
    frames = _device_frames(batch_size)

    if fused == "int8":
        # W8A8 opt-in fast path: calibrate activation scales on one
        # batch, then serve with static scales.
        from pvr_habitat_tpu.ops import quantize as q

        params_q = jax.jit(q.quantize_resnet_params)(_device_init(params))
        # The scales are a pure function of the seeded params + seeded
        # calibration batch, so they persist next to the compile cache:
        # a retry (or the driver's end-of-round run) skips the whole
        # calibration dispatch — on a slow tunnel that phase alone can
        # exceed 180 s (observed 2026-08-19).
        scales = _load_cached_scales()
        if scales is None:
            calib = _device_frames(32, seed=1)
            x = preprocess(calib, precision=jax.lax.Precision.DEFAULT,
                           out_dtype=jnp.bfloat16)
            _, scales = resnet.apply_int8(params_q, x, spec)
            # ONE stacked fetch for all activation scales (per-scalar
            # float() fetches pay a ~24 ms+ round-trip each).
            names = sorted(scales)
            stacked = np.asarray(jnp.stack([scales[n] for n in names]))
            scales = {n: float(v) for n, v in zip(names, stacked)}
            _store_cached_scales(scales)

        @jax.jit
        def forward_q(params, frames):
            x = preprocess(frames, precision=jax.lax.Precision.DEFAULT,
                           out_dtype=jnp.bfloat16)
            out, _ = resnet.apply_int8(params, x, spec, scales=scales)
            return out

        return forward_q, params_q, frames

    params = jax.jit(
        lambda p: jax.tree.map(lambda x: x.astype(dtype), p))(
            _device_init(params))
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

    return forward, params, frames


def run_child(args):
    """One measurement attempt. Exits RC_PHASE_TIMEOUT on a phase hang."""
    stub = os.environ.get("PVR_BENCH_STUB_BEHAVIOR")
    if stub:
        # Hermetic supervisor-test mode: no JAX, deterministic outcome.
        if stub == "ok":
            _log(f"{PHASE_PREFIX} timed_loop +0.0s")
            _emit({"metric": METRIC, "value": 12345.0, "unit": "frames/sec",
                   "vs_baseline": 1.234, "path": args.fused})
            return RC_OK
        if stub == "hang":
            _log(f"{PHASE_PREFIX} compile_warmup +0.0s")
            time.sleep(3600)
        if stub == "init_hang":
            # A wedged tunnel: blocked inside backend init, alarms dead.
            _log(f"{PHASE_PREFIX} backend_init +0.0s")
            time.sleep(3600)
        if stub == "wedge":
            _log(f"{PHASE_PREFIX} TIMEOUT in phase=tiny_probe +1.0s")
            return RC_PHASE_TIMEOUT
        if stub == "compile_fail":
            _log(f"{PHASE_PREFIX} compile_warmup +2.0s")
            return 1
        return 1  # stub == "fail"

    ph = _Phased()

    ph.enter("backend_init")
    import numpy as np  # noqa: F401
    import jax

    # Persistent compile cache BEFORE backend init (see DEFAULT_CACHE_DIR
    # note): retries and the driver's end-of-round run reuse this
    # session's compiled executables instead of recompiling for minutes.
    cache_dir = os.environ.get("PVR_BENCH_CACHE_DIR", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # cache is an optimization, never fatal
        _log(f"  compile cache unavailable: {e}")

    import jax.numpy as jnp
    devices = jax.devices()
    _log(f"  devices={devices}")

    ph.enter("tiny_probe")
    # block_until_ready is a no-op through the axon tunnel; a host
    # fetch is the only reliable fence.
    probe = float(jnp.sum(jnp.ones((8, 8))))
    assert probe == 64.0

    if args.probe_only:
        ph.done()
        _emit({"metric": "tunnel_probe", "value": 1.0, "unit": "ok",
               "vs_baseline": 1.0})
        return RC_OK

    # For int8, build_forward dispatches the calibration compile +
    # scale fetches; give that work the longer 'calibrate' deadline.
    ph.enter("calibrate" if args.fused == "int8" else "build")
    forward, params, frames = build_forward(args.batch_size,
                                            fused=args.fused)

    def sync(x):
        # Device execution is serialized per chip, so fetching a scalar
        # of the LAST output drains the queue.
        return float(jnp.sum(x.astype(jnp.float32)))

    ph.enter("compile_warmup")
    out = forward(params, frames)
    sync(out)
    for _ in range(args.warmup):
        out = forward(params, frames)
    sync(out)

    ph.enter("timed_loop")
    start = time.perf_counter()
    for _ in range(args.iters):
        out = forward(params, frames)
    sync(out)
    elapsed = time.perf_counter() - start
    ph.done()

    fps = args.batch_size * args.iters / elapsed
    _emit({
        "metric": METRIC,
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "path": args.fused,
    })
    return RC_OK


# ---------------------------------------------------------------------------
# Parent: supervise attempts, retry, fall back, always emit one line.
# ---------------------------------------------------------------------------

def _launch_attempt(args, fused, deadline_s, stub_behavior=None,
                    probe_only=False, hard_deadline_s=None):
    """Run one child attempt; returns (ok, payload_or_None, last_phase).

    ``deadline_s`` applies only while the child sits in the wedge-prone
    phases (launch/backend_init/tiny_probe).  A child that reached the
    compute phases is PROGRESSING — killing it mid-RPC is what renews a
    terminal-side wedge for tens of minutes (observed 2026-08-18/19:
    attempt 1 killed mid-calibrate wedged attempts 2-3's tiny_probe) —
    so past the probe it owns the budget up to ``hard_deadline_s``
    (default: same as deadline_s), the supervisor's one-JSON-line floor."""
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--fused", fused,
           "--batch_size", str(args.batch_size),
           "--iters", str(args.iters),
           "--warmup", str(args.warmup)]
    if probe_only:
        cmd.append("--probe-only")
    env = dict(os.environ)
    env.pop("PVR_BENCH_STUB", None)
    env.pop("PVR_BENCH_STUB_BEHAVIOR", None)
    if stub_behavior:
        env["PVR_BENCH_STUB_BEHAVIOR"] = stub_behavior
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, env=env, text=True)

    start = time.time()
    # [phase, entered_at] — the pump thread advances it, the wait loop
    # below enforces PARENT_PHASE_LIMITS against it (the child's own
    # alarms cannot fire while it is GIL-blocked in a wedged RPC).
    last_phase = ["launch", start]

    def _pump_stderr():
        for line in proc.stderr:
            line = line.rstrip("\n")
            _log(f"  [child] {line}")
            if line.startswith(PHASE_PREFIX):
                token = line.split()[1]
                if token == "TIMEOUT":
                    last_phase[0] = (line.split("phase=")[-1].split()[0]
                                     + " (phase deadline)")
                elif token != "done":
                    last_phase[:] = [token, time.time()]

    t = threading.Thread(target=_pump_stderr, daemon=True)
    t.start()
    killed = None  # descriptive string when the parent kills the child
    while True:
        try:
            proc.wait(timeout=2.0)
            break
        except subprocess.TimeoutExpired:
            pass
        now = time.time()
        override = os.environ.get("PVR_BENCH_INIT_LIMIT")
        phase, entered = last_phase
        in_wedge_phase = any(phase.startswith(w) for w in WEDGE_PHASES)
        hard = hard_deadline_s if hard_deadline_s is not None else deadline_s
        if now - start > hard:
            killed = f"killed at {hard:.0f}s"
        elif in_wedge_phase and now - start > deadline_s:
            killed = f"killed at {deadline_s:.0f}s"
        else:
            limit = PARENT_PHASE_LIMITS.get(phase)
            if limit is not None and override:
                limit = float(override)  # test hook
            if limit is not None and now - entered > limit:
                killed = (f"killed: stuck in {phase} "
                          f"{now - entered:.0f}s > {limit:.0f}s")
        if killed:
            proc.kill()
            proc.wait()
            break
    t.join(timeout=5)
    stdout = proc.stdout.read()
    proc.stdout.close()
    proc.stderr.close()

    if killed:
        return False, None, f"{last_phase[0]} ({killed})"
    if proc.returncode == RC_OK:
        for line in stdout.splitlines():
            try:
                payload = json.loads(line)
            except ValueError:
                continue
            if isinstance(payload, dict) and "metric" in payload:
                return True, payload, last_phase[0]
        return False, None, f"{last_phase[0]} (no JSON, rc=0)"
    return False, None, f"{last_phase[0]} (rc={proc.returncode})"


def supervise(args):
    t0 = time.time()

    def remaining():
        return args.budget - (time.time() - t0)

    stubs = (os.environ.get("PVR_BENCH_STUB") or "").split(":")
    stubs = [s for s in stubs if s]

    def next_stub():
        return stubs.pop(0) if stubs else None

    failures = []
    fused = args.fused
    wedge_failures = 0
    i = 0
    # Dynamic attempt count: with parent-side init-phase kills a wedged
    # attempt costs ~45 s, so a 400 s budget fits 4+ attempts instead of
    # round-3's two.  When stubs drive the supervisor (tests), the
    # attempt count is exactly the stub list.
    while remaining() >= 45 and not (stubs == [] and
                                     os.environ.get("PVR_BENCH_STUB")):
        i += 1
        # The wedge-phase deadline caps how long a NON-progressing
        # attempt can cost (so several retries fit in the budget); a
        # progressing attempt runs to the budget floor — slow beats
        # killed, because a killed in-flight RPC renews the wedge.
        # The floor is additionally capped at 3x the attempt deadline
        # so one dead post-probe child (e.g. a pathological host-side
        # compile) cannot zero an otherwise-healthy large budget
        # (ADVICE r4); at the default 400s budget this is a no-op.
        hard = max(min(remaining() - 10, 3 * args.attempt_deadline), 40)
        deadline = min(hard, args.attempt_deadline)
        _log(f"[bench] attempt {i} path={fused} "
             f"deadline={deadline:.0f}s hard={hard:.0f}s "
             f"budget_left={remaining():.0f}s")
        ok, payload, phase = _launch_attempt(args, fused, deadline,
                                             stub_behavior=next_stub(),
                                             hard_deadline_s=hard)
        if ok:
            if failures:
                payload["note"] = (f"attempt {i} succeeded after: "
                                   + "; ".join(failures))
            _emit(payload)
            return 0
        failures.append(f"attempt {i} path={fused} died in {phase}")
        _log(f"[bench] {failures[-1]}")
        wedged = any(w in phase for w in WEDGE_PHASES)
        if wedged:
            wedge_failures += 1
            # The tunnel, not the path, failed.  After two wedge
            # failures ALSO drop to the plain bf16 path: it has fewer
            # compile/dispatch steps, so a brief healthy window late in
            # the budget is more likely to yield a capture (a ~12 k bf16
            # number beats a 0.0).  Cool down so a terminal-side wedge
            # can clear (short wedges do; long ones — renewed by killed
            # in-flight RPCs — outlast any budget, and the sentinel
            # says so).
            if wedge_failures >= 2:
                fused = "off"
            if remaining() > 150:
                cool = min(60, remaining() - 120)
                _log(f"[bench] tunnel looks wedged; cooling down "
                     f"{cool:.0f}s")
                time.sleep(max(cool, 0))
        else:
            # The path got past the probe and still died: fall back to
            # the plain bf16 XLA path.
            fused = "off"

    _emit({
        "metric": METRIC,
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
        "note": "all attempts failed: " + "; ".join(failures),
    })
    return 2


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
    parser.add_argument("--budget", type=float, default=400.0,
                        help="Global wall-clock budget (s); one JSON "
                             "line is guaranteed on stdout within it.")
    parser.add_argument("--attempt_deadline", type=float, default=240.0,
                        help="Hard kill deadline per child attempt (s).")
    parser.add_argument("--child", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--probe-only", dest="probe_only",
                        action="store_true",
                        help="Just check tunnel health (tiny op) and "
                             "exit; no benchmark.")
    args = parser.parse_args()

    if args.child:
        sys.exit(run_child(args))

    if args.probe_only:
        ok, payload, phase = _launch_attempt(args, "off", 240,
                                             probe_only=True)
        _emit(payload if ok else
              {"metric": "tunnel_probe", "value": 0.0, "unit": "ok",
               "vs_baseline": 0.0, "note": f"died in {phase}"})
        sys.exit(0 if ok else 2)

    try:
        sys.exit(supervise(args))
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — contract: always one line
        _emit({"metric": METRIC, "value": 0.0, "unit": "frames/sec",
               "vs_baseline": 0.0,
               "note": f"supervisor crashed: {type(e).__name__}: {e}"})
        sys.exit(2)


if __name__ == "__main__":
    main()
