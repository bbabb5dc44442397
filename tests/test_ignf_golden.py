"""Replay of the reference's IGNF regression corpus
(nad/testIGNF -> nad/proj_outIGNF.dist): every cs2cs invocation over
the French IGNF init catalog, including the REAL ntf_r93.gsb NTv2
datum grid, +towgs84 Helmert datums, Lambert zone conversions,
Miller/equirect frames, and a geocentric pair — compared at the
distribution's print precision.

Plus the NTv1-fallback block of nad/testntv2 (the subset whose grid,
ntv1_can.dat, ships with the reference).
"""
from __future__ import annotations

import os
import re

import numpy as np
import pytest

NAD = "/root/reference/nad"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(NAD, "proj_outIGNF.dist")),
    reason="reference tree absent",
)


def _maybe_dms(tok: str) -> float:
    from proj_spark.crs import dmstor
    from proj_spark.kernels.xmath import RAD_TO_DEG

    if re.search(r"[dDnNsSeEwW'\"]", tok) and not re.fullmatch(
        r"[-+]?\d+(\.\d*)?([eE][-+]?\d+)?", tok
    ):
        return dmstor(tok) * RAD_TO_DEG
    return float(tok)


def _parse_dist(path: str):
    """Yield (src_init, dst_init, inputs[], outputs[]) per data line."""
    blocks = []
    src = dst = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("+init="):
                m = re.match(r"\+init=\S*IGNF:(\w+) \+to \+init=\S*IGNF:(\w+)", line)
                assert m, line
                src, dst = m.group(1), m.group(2)
                continue
            if not line.strip():
                continue
            parts = line.split("\t")
            assert len(parts) >= 3, line
            ins = parts[0].split()
            out1 = parts[1].strip()
            tail = parts[2].split()
            out2 = tail[0]
            outz = tail[1] if len(tail) > 1 else "0"
            blocks.append((src, dst, ins, [out1, out2, outz]))
    return blocks


def test_ignf_corpus_full_replay():
    from proj_spark.crs import CRS
    from proj_spark.plans.pipeline import transform_arrays
    from proj_spark.sources.initfiles import set_search_path

    set_search_path([NAD])
    os.environ["PROJ_SPARK_LIB"] = NAD
    rows = _parse_dist(os.path.join(NAD, "proj_outIGNF.dist"))
    assert len(rows) >= 30
    failures = []
    crs_cache = {}

    def crs_of(name):
        if name not in crs_cache:
            crs_cache[name] = CRS.from_proj4(f"+init=IGNF:{name}")
        return crs_cache[name]

    for src, dst, ins, outs in rows:
        s = crs_of(src)
        d = crs_of(dst)
        u = _maybe_dms(ins[0])
        v = _maybe_dms(ins[1])
        z = float(ins[2]) if len(ins) > 2 else 0.0
        x, y, zo = transform_arrays(s, d, [u], [v], [z])
        exp_x = _maybe_dms(outs[0])
        exp_y = _maybe_dms(outs[1])
        exp_z = float(outs[2])
        if d.is_latlong:
            tol = 5e-7  # 0.001" print precision
        else:
            tol = 2e-3  # %.3f print precision
        ok = (
            abs(x[0] - exp_x) <= tol
            and abs(y[0] - exp_y) <= tol
            and abs(zo[0] - exp_z) <= max(2e-3, tol)
        )
        if not ok:
            failures.append(
                f"{src}->{dst} {ins}: got ({x[0]!r},{y[0]!r},{zo[0]!r}) "
                f"want ({exp_x},{exp_y},{exp_z})"
            )
    assert not failures, f"{len(failures)}/{len(rows)} mismatches:\n" + "\n".join(
        failures[:12]
    )


def test_ntv2_script_ntv1_fallback_block():
    """nad/testntv2 block 2 ('falls back to NTv1'): the three points
    resolve through ntv1_can.dat (shipped), matching ntv2_out.dist at
    -w4 (0.0001") precision; ntv2_0.gsb and conus are optional-missing."""
    from proj_spark.crs import dmstor
    from proj_spark.kernels.xmath import RAD_TO_DEG
    from proj_spark.plans.pipeline import transform_arrays
    from proj_spark.sources.initfiles import set_search_path

    set_search_path([NAD])
    os.environ["PROJ_SPARK_LIB"] = NAD
    src = "+proj=latlong +ellps=clrk66 +nadgrids=@ntv2_0.gsb,ntv1_can.dat,@conus"
    dst = "+proj=latlong +datum=NAD83"
    # only the 46N Montana point is OUTSIDE ntv2_0.gsb (which the
    # reference had installed but is not shipped) — the other two of
    # the script's points resolved through ntv2_0 there, so only this
    # one is replayable grid-faithfully (verified: it matches to
    # 3e-5 arcsec; the ntv2_0-covered points differ by ~0.06-0.4")
    cases = [
        ("111d00'00.000\"W", "46d00'00.000\"N", "111d0'3.1549\"W", "45d59'59.7528\"N"),
    ]
    R = RAD_TO_DEG
    lons = [dmstor(c[0]) * R for c in cases]
    lats = [dmstor(c[1]) * R for c in cases]
    x, y, _ = transform_arrays(src, dst, lons, lats)
    for i, c in enumerate(cases):
        assert abs(x[i] - dmstor(c[2]) * R) < 5e-8, (c, x[i])  # -w4: 0.0001"
        assert abs(y[i] - dmstor(c[3]) * R) < 5e-8, (c, y[i])
