"""bench.py supervisor contract tests (hermetic, no TPU, no JAX).

The driver's scoreboard is bench.py's single stdout JSON line; round 2
lost its entry to an unobserved tunnel wedge (BENCH_r02.json rc=2,
value 0.0, no phase attribution).  These tests drive the parent
supervisor against stub children (PVR_BENCH_STUB, colon-separated
per-attempt behaviors) and pin the resilience contract:

- success emits exactly one parseable line,
- a failed attempt triggers a retry,
- a post-probe failure falls back int8 -> bf16,
- a post-probe child is never killed at the attempt deadline (killed
  in-flight RPCs renew tunnel wedges), only at the budget floor,
- total failure still emits a valid line with phase attribution.
"""

import json
import os
import re
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def run_bench(stub, extra=(), timeout=150, env_extra=None):
    env = dict(os.environ)
    env["PVR_BENCH_STUB"] = stub
    env.update(env_extra or {})
    # Budget under 150 s skips the wedge cool-down sleep (keeps tests
    # fast) but stays above the 45 s minimum-attempt threshold.
    # 45 s per-attempt deadline: bare python startup measures ~12 s
    # wall when background training loads this 1-core host (load avg
    # 7+), so the stub child needs real headroom; the hang-kill test
    # still only pays one deadline.
    cmd = [sys.executable, BENCH, "--budget", "120",
           "--attempt_deadline", "45", *extra]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, env=env)
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {proc.stdout!r}"
    return proc.returncode, json.loads(lines[0]), proc.stderr


def test_success_emits_single_json_line():
    rc, payload, _ = run_bench("ok")
    assert rc == 0
    assert payload["metric"] == "resnet50_embed_fps_per_chip"
    assert payload["value"] == 12345.0
    assert payload["unit"] == "frames/sec"
    assert payload["path"] == "int8"


def test_post_probe_failure_falls_back_to_bf16():
    # Child dies in compile_warmup -> the int8 path is at fault -> the
    # retry must run the plain bf16 path ("off").
    rc, payload, _ = run_bench("compile_fail:ok")
    assert rc == 0
    assert payload["value"] == 12345.0
    assert payload["path"] == "off"
    assert "attempt 1" in payload["note"]
    assert "compile_warmup" in payload["note"]


def test_wedge_retries_same_path():
    # Child times out in tiny_probe -> tunnel wedge -> retry keeps int8.
    rc, payload, _ = run_bench("wedge:ok")
    assert rc == 0
    assert payload["path"] == "int8"
    assert "tiny_probe" in payload["note"]


def test_post_probe_child_owns_the_budget_floor():
    # A child that reached the compute phases is PROGRESSING from the
    # parent's viewpoint; killing it mid-RPC renews terminal-side
    # wedges (observed 2026-08-19: attempt 1 killed mid-calibrate
    # wedged attempts 2-3's tiny_probe).  Contract: the attempt
    # deadline does NOT apply past tiny_probe — the child runs to the
    # budget floor, and the one-JSON-line guarantee still holds there.
    rc, payload, _ = run_bench("hang", timeout=200,
                               extra=("--budget", "60",
                                      "--attempt_deadline", "15"))
    assert rc == 2
    assert payload["value"] == 0.0
    assert "compile_warmup" in payload["note"]
    # The kill lands at the budget floor: decisively above the 15s
    # attempt deadline but inside the 60s budget (parsed, not pinned to
    # the floor formula — ADVICE r4).
    match = re.search(r"killed at (\d+)s", payload["note"])
    assert match, payload["note"]
    assert 15 < int(match.group(1)) <= 60


def test_wedged_init_is_killed_by_parent_phase_limit():
    # A child GIL-blocked in backend_init never fires its own SIGALRM
    # (round-3 failure mode: 240 s burned waiting on a wedged init).
    # The PARENT must kill it at the phase limit, classify it as a
    # wedge, and retry on the same path.
    rc, payload, _ = run_bench("init_hang:ok",
                               env_extra={"PVR_BENCH_INIT_LIMIT": "5"})
    assert rc == 0
    assert payload["value"] == 12345.0
    assert payload["path"] == "int8"
    assert "stuck in backend_init" in payload["note"]


def test_two_wedge_failures_fall_back_to_bf16():
    # After two wedge failures the supervisor drops to the bf16 path
    # (fewer compile/dispatch steps -> better capture odds in a brief
    # healthy window late in the budget).
    rc, payload, _ = run_bench("wedge:wedge:ok")
    assert rc == 0
    assert payload["value"] == 12345.0
    assert payload["path"] == "off"


def test_total_failure_emits_attributed_sentinel():
    rc, payload, _ = run_bench("compile_fail:compile_fail:compile_fail")
    assert rc == 2
    assert payload["value"] == 0.0
    assert payload["vs_baseline"] == 0.0
    assert "compile_warmup" in payload["note"]
    assert "attempt 3" in payload["note"]


def test_device_side_init_and_frames():
    """bench's setup must not upload params/frames through the tunnel:
    params come from ONE on-device rng expansion sliced per leaf,
    frames from an on-device randint — both reproduce shapes/dtypes."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from pvr_habitat_tpu.ops import quantize as q

    host = {"a.weight": np.zeros((3, 3, 4, 8), np.float32),
            "a.bias": np.zeros((8,), np.float32)}
    dp = bench._device_init(host)
    assert dp["a.weight"].shape == (3, 3, 4, 8)
    assert dp["a.bias"].shape == (8,)
    # distinct leaves get distinct values (the flat slice offsets work)
    assert float(jnp.std(dp["a.weight"])) > 0
    assert not np.allclose(np.asarray(dp["a.weight"]).ravel()[:8],
                           np.asarray(dp["a.bias"]))
    qp = jax.jit(q.quantize_resnet_params)(dp)
    assert qp["a.weight"].dtype == jnp.int8
    assert "a.wscale" in qp

    frames = np.asarray(bench._device_frames(4))
    assert frames.shape == (4, 64, 64, 3)
    assert frames.dtype == np.uint8
    assert frames.min() >= 0 and frames.max() <= 255


@pytest.mark.parametrize("stub", ["ok", "compile_fail:compile_fail:fail"])
def test_stdout_is_machine_parseable_end_to_end(stub):
    # The driver does json.loads on the line; telemetry must stay on
    # stderr only.
    rc, payload, stderr = run_bench(stub)
    assert isinstance(payload, dict)
    assert "BENCHPHASE" not in json.dumps(payload)
    assert "[bench]" in stderr
