"""Driver entry-point checks: the single-chip entry() compiles, and
dryrun_multichip works both when enough devices exist (direct path, as in this
test env's 8-device virtual CPU mesh) and when it must self-bootstrap a
virtual mesh in a subprocess (the driver's 1-device axon condition).
"""

import pathlib
import sys

import jax
import pytest

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 4096, 5)


@pytest.mark.slow
@pytest.mark.mesh
def test_dryrun_direct_path():
    # conftest gives this process 8 virtual CPU devices -> direct path.
    # The FULL 14-stage dryrun: ~410 s solo (dryrun_mode_walls.json) —
    # slow tier per VERDICT r4 #3.
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_bootstrap_subprocess():
    # Force the subprocess bootstrap path the driver hits (its process has a
    # single axon device). The subprocess builds its own 2-device CPU mesh.
    graft._bootstrap_virtual_mesh(2)
