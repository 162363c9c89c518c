"""Driver entry points stay healthy: entry() compiles and runs; dryrun_multichip
exercises the full sharded train step on the virtual 8-device mesh."""
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    colour, depth = out
    assert colour.shape == (1024, 3)
    assert depth.shape == (1024, 1)
    assert np.isfinite(np.asarray(colour)).all()


def test_dryrun_multichip_eight_devices(capsys):
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
    captured = capsys.readouterr()
    assert "dryrun_multichip(8) OK" in captured.out
