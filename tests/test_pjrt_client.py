"""C++ PJRT client: build + plugin version negotiation + error paths.

The full compile/execute path needs a local standalone PJRT plugin (the TPU
here is reached through a session-claiming tunnel plugin), so the runtime
test covers the probe handshake against the real libtpu.so and the failure
modes; the execute sequence follows the canonical PJRT C API calls.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

from yolov10_3d_tpu.native import build_pjrt_client

LIBTPU = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"


@pytest.fixture(scope="module")
def client_bin(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    out = build_pjrt_client(str(tmp_path_factory.mktemp("pjrt") / "pjrt_client"))
    if out is None:
        pytest.skip("pjrt_c_api.h not available")
    return out


def test_probe_negotiates_api_version(client_bin):
    if not Path(LIBTPU).exists():
        pytest.skip("no libtpu.so")
    r = subprocess.run([client_bin, LIBTPU, "--probe"],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0
    assert "PJRT API version" in r.stdout


def test_bad_plugin_errors(client_bin):
    r = subprocess.run([client_bin, "/nonexistent.so", "--probe"],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 1
    assert "dlopen failed" in r.stderr


def test_missing_args_usage(client_bin):
    r = subprocess.run([client_bin], capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "usage" in r.stderr
