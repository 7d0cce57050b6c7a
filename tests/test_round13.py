"""Round-13 pins: the four ADVICE-r12 defects and this round's new
operators. Each test names the defect it pins so a regression reads as
a reopened advice item, not a mystery."""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pytest

from blow_spark import materialize as M
from tests.test_materialize import own_registry  # noqa: F401 (fixture)


def test_reap_age_rule_probes_pid_named_artifacts(own_registry):
    """ADVICE r12 #1: the age-based fallback must not delete a pkg zip
    whose embedded pid is still alive — a >48h session's addPyFile
    artifact is live for as long as its process is."""
    tmp = tempfile.gettempdir()
    ours = os.path.join(tmp, f"blow_spark_pkg_{os.getpid()}_77777.zip")
    dead = os.path.join(tmp, "blow_spark_pkg_4999999_77777.zip")
    for p in (ours, dead):
        with open(p, "w") as fh:
            fh.write("zip-stand-in")
        past = time.time() - 9 * 3600
        os.utime(p, (past, past))
    try:
        M.reap_orphan_scratch(max_age_hours=8)
        assert os.path.exists(ours), "live-pid zip was age-reaped"
        assert not os.path.exists(dead), "dead-pid zip survived the age rule"
    finally:
        for p in (ours, dead):
            if os.path.exists(p):
                os.remove(p)


def test_register_scratch_redrops_overwritten_markers(own_registry):
    """ADVICE r12 #2: df.write.mode('overwrite') into a scratch dir
    deletes and recreates it, losing the owner marker; the next
    register_scratch call must restore markers on marker-less live
    dirs so crashed sessions still get the dead-pid fast reap."""
    d1 = M.scratch_dir(prefix="blow_spark_remark_test_")
    marker = os.path.join(d1, M._OWNER_MARKER)
    # simulate the overwrite: dir recreated without the marker
    os.remove(marker)
    assert not os.path.exists(marker)
    d2 = M.scratch_dir(prefix="blow_spark_remark_test_")
    assert os.path.exists(marker), "lost marker was not re-dropped"
    assert open(marker).read().strip() == str(os.getpid())
    for p in (d1, d2):
        M._remove_path(p)


def test_decode_qoi_truncation_raises_valueerror_everywhere():
    """ADVICE r12 #3: every possible truncation point must raise
    ValueError (the documented contract), never IndexError."""
    from blow_spark.multimodal import decode_qoi, encode_qoi

    img = (np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 7) % 256
    enc = encode_qoi(img)
    assert (decode_qoi(enc) == img).all()
    for cut in range(14, len(enc)):
        with pytest.raises(ValueError):
            decode_qoi(enc[:cut])
