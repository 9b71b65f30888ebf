"""Validate the driver entry points on the virtual 8-device CPU mesh."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    jitted = jax.jit(fn)
    logits, preds = jitted(*args)
    assert logits.shape[0] == 128
    assert preds.shape == (128, 17)
