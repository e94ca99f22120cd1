"""Checkpoint converter: torch<->flax mapping roundtrip + layout parity."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_mapping_roundtrip_cva1():
    from tools.convert_torch_ckpt import roundtrip_test

    roundtrip_test(1)


def test_layout_converters():
    from tools.convert_torch_ckpt import selftest

    selftest()
