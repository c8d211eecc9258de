"""Option-surface parity lock: every reference CLI flag must exist.

Parses `cmd:option` declarations straight out of the reference's
opts.lua (read-only) so drift in either direction is caught — a flag
the reference has that Options lacks fails here. Skips hermetically
when the reference checkout is absent.
"""

import dataclasses
import re
from pathlib import Path

import pytest

from back2future_tpu.config import Options, parse_args

REF_OPTS = Path("/root/reference/opts.lua")


class TestFlagSurface:
    @pytest.mark.skipif(not REF_OPTS.exists(), reason="reference absent")
    def test_every_reference_flag_is_an_option(self):
        flags = re.findall(r"cmd:option\(\s*'-([A-Za-z_]+)'",
                           REF_OPTS.read_text())
        assert len(flags) >= 60, f"parse drift: only {len(flags)} flags"
        fields = {f.name for f in dataclasses.fields(Options)}
        missing = sorted(set(flags) - fields)
        assert not missing, f"reference flags without an Option: {missing}"

    def test_gpu_flag_parses(self):
        opt = parse_args(["--GPU", "2", "--nGPU", "1", "--expName", "t",
                          "--cache", "/tmp/b2f_cfg_test"])
        assert opt.GPU == 2

    def test_derive_rejects_even_multiframe(self):
        with pytest.raises(AssertionError, match="2 or odd"):
            Options(frames=4).derive()
