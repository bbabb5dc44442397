"""Replay of the reference's testflakey regression corpus
(nad/testflakey driving cs2cs, golden nad/tf_out.dist): 13 golden
lines of HEALPix inverse projection on spheres (+a=1 and +a=5),
exercising the -I swap-before-resolution path and the lat/lon
boundary snaps of the inverse (healpix.c in_image edge handling).

Round-3 verdict item 2: this was the only shipped golden corpus with
no replay (it needs no grid files at all).  Same block-parse +
compare machinery as test_testvarious_golden, which this reuses.
"""
from __future__ import annotations

import os
import re

import numpy as np
import pytest

from tests.test_testvarious_golden import (
    _num_or_dms,
    _parse_script,
    _resolve_pair,
    _split_invocation,
)

NAD = "/root/reference/nad"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(NAD, "testflakey")), reason="reference tree absent"
)


def test_testflakey_corpus_replay():
    from proj_spark.crs import CRS
    from proj_spark.plans.pipeline import transform_arrays

    events = _parse_script(os.path.join(NAD, "testflakey"))
    with open(os.path.join(NAD, "tf_out.dist")) as f:
        golden = [ln.rstrip("\n") for ln in f]

    gi = 0
    replayed = 0
    failures = []
    for ev in events:
        if ev[0] == "echo":
            assert golden[gi].split() == ev[1].split(), (golden[gi], ev[1])
            gi += 1
            continue
        _, args, body = ev
        out_lines = golden[gi : gi + len(body)]
        gi += len(body)
        flags, src_s, dst_s = _split_invocation(args.replace("\\", ""))
        src_s, dst_s = _resolve_pair(flags, src_s or None, dst_s)
        src, dst = CRS.from_proj4(src_s), CRS.from_proj4(dst_s)

        us, vs, zs = [], [], []
        for line in body:
            toks = line.split()
            us.append(_num_or_dms(toks[0], src.is_latlong))
            vs.append(_num_or_dms(toks[1], src.is_latlong))
            zs.append(float(toks[2]) if len(toks) > 2 else 0.0)
        x, y, z = transform_arrays(src, dst, us, vs, zs)

        # the script spells the format as -f '%.'5'f' (shell concat)
        fmt = (flags["f"] or "%.2f").replace("'", "")
        m = re.match(r"%\.(\d+)f", fmt)
        tol = 1.5 * 10.0 ** -(int(m.group(1)))
        for j, gl in enumerate(out_lines):
            parts = gl.split("\t")
            o1 = float(parts[-2].strip())
            tail = parts[-1].split()
            o2, oz = float(tail[0]), float(tail[1])
            if (
                np.isnan(x[j])
                or abs(x[j] - o1) > tol
                or abs(y[j] - o2) > tol
                or abs(z[j] - oz) > tol
            ):
                failures.append(
                    f"row {j} of {args.strip()[:60]}: got "
                    f"({x[j]!r}, {y[j]!r}, {z[j]!r}) want {gl!r}"
                )
        replayed += 1

    assert gi == len(golden), "golden lines left unconsumed"
    assert not failures, f"{len(failures)} failures:\n" + "\n".join(failures)
    assert replayed == 2  # both heredoc blocks, 12 data lines + banner
