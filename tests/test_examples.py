"""Examples must stay runnable (they are the reference's example parity)."""

import subprocess
import sys

import pytest

# Example scripts are full Spark-session e2e runs (15-30s each);
# they are the canonical docs smoke, not unit coverage.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("script", [
    "examples/basic_usage.py",
    "examples/local_demo.py",
    "examples/pipeline_demo.py",
    "examples/secure_polygon_integration.py",
    "examples/multi_asset_class_demo.py",
    "examples/validate.py",
    "examples/corpus_curation.py",
    "examples/training_data_prep.py",
    "examples/quant_screen_demo.py",
    "examples/data_audit_demo.py",
    "examples/distribution_health_demo.py",
    "examples/experimentation_demo.py",
    "examples/tpch_demo.py",
])
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, script], cwd="/root/repo",
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
