"""bench.py weather-proofing: the watchdog must turn a wedged
compile-service window into ONE informative JSON line within the budget
instead of hanging into a driver-side timeout (VERDICT r2 weak #6;
BENCH_r02 observed a 568 s forward compile vs 65 s warm)."""

import json
import os
import subprocess
import sys
import time


def test_watchdog_emits_degraded_json_under_wedged_compile():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "MODCR_BENCH_DEADLINE": "3",       # tiny budget
        "MODCR_BENCH_TEST_SLEEP": "60",    # simulated wedged stage
    })
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "bench.py")],
        capture_output=True, text=True, timeout=45, env=env,
        cwd="/root/repo",
    )
    elapsed = time.time() - t0
    assert elapsed < 40, f"watchdog did not fire in time ({elapsed:.0f}s)"
    assert proc.returncode == 3, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout          # stdout stays one JSON line
    payload = json.loads(lines[0])
    assert payload["degraded"] is True
    assert payload["stage"] == "test-sleep"
    assert payload["metric"] == "pmr_val_inference_examples_per_sec_per_chip"
