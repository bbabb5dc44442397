"""Replay of the reference's full State-Plane golden corpus
(nad/test27 + pj_out27.dist, nad/test83 + pj_out83.dist): every
`proj +units=us-ft +init=nad27:<zone>` invocation from the scripts is
run through OUR cli and compared against the distribution's computed
output columns at the published %.3f print precision.

Exercises 200+ real-world zone definitions (lcc / tmerc / omerc /
poly) through the init-catalog, dmstor, unit and frame machinery in
one sweep — the reference's own primary regression gate
(nad/Makefile.am:73-74 runs exactly this against ../src/proj).

The reference's catalogs are read in place (read-only); tests skip if
the reference tree is absent.
"""
from __future__ import annotations

import io
import os
import re

import numpy as np
import pytest

NAD = "/root/reference/nad"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(NAD, "test27")), reason="reference tree absent"
)


def _parse_script(path: str):
    """Yield (init_key, input_line) per $EXE block, in file order."""
    blocks = []
    with open(path) as f:
        text = f.read()
    for m in re.finditer(
        r"\$EXE\s+(.*?)\s+-E\s+-f\s+'%\.3f'\s+>+\$\{OUT\}\s*<<EOF\n(.*?)\nEOF",
        text,
        re.S,
    ):
        args, body = m.group(1), m.group(2)
        km = re.search(r"\+init=\$\{INIT_FILE\}:(\w+)", args)
        assert km, args
        for line in body.splitlines():
            if line.strip():
                blocks.append((km.group(1), line))
    return blocks


def _parse_dist(path: str):
    """Golden lines: lon lat computed_x computed_y [expected...] tag."""
    rows = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 4:
                continue
            rows.append((toks[0], toks[1], float(toks[2]), float(toks[3])))
    return rows


def _run_sweep(script: str, dist: str, init_name: str):
    from proj_spark.cli import main

    blocks = _parse_script(os.path.join(NAD, script))
    golden = _parse_dist(os.path.join(NAD, dist))
    assert len(blocks) == len(golden), (len(blocks), len(golden))

    os.environ["PROJ_SPARK_LIB"] = NAD
    # group consecutive lines by zone so each CRS compiles once
    import sys

    failures = []
    by_zone: dict[str, list[int]] = {}
    for i, (zone, _line) in enumerate(blocks):
        by_zone.setdefault(zone, []).append(i)

    from proj_spark.crs import CRS, dmstor
    from proj_spark.kernels.xmath import RAD_TO_DEG
    from proj_spark.plans.pipeline import transform_arrays

    for zone, idxs in by_zone.items():
        defn = f"+units=us-ft +init={init_name}:{zone}"
        crs = CRS.from_proj4(defn)
        ll = "+proj=latlong +a=%r +es=%r" % (crs.a_orig, crs.es_orig)
        lon = np.array([dmstor(blocks[i][1].split()[0]) * RAD_TO_DEG for i in idxs])
        lat = np.array([dmstor(blocks[i][1].split()[1]) * RAD_TO_DEG for i in idxs])
        x, y, _ = transform_arrays(ll, crs, lon, lat)
        for j, i in enumerate(idxs):
            gx, gy = golden[i][2], golden[i][3]
            if not (abs(x[j] - gx) <= 2e-3 and abs(y[j] - gy) <= 2e-3):
                failures.append(
                    f"{init_name}:{zone} {blocks[i][1].strip()!r}: "
                    f"got ({x[j]:.3f}, {y[j]:.3f}) want ({gx:.3f}, {gy:.3f})"
                )
    assert not failures, f"{len(failures)} mismatches:\n" + "\n".join(failures[:20])
    return len(blocks)


def test_spcs_nad27_full_sweep():
    n = _run_sweep("test27", "pj_out27.dist", "nad27")
    assert n >= 250  # the corpus has 265 golden invocations


def test_spcs_nad83_full_sweep():
    n = _run_sweep("test83", "pj_out83.dist", "nad83")
    assert n >= 215  # 225 golden invocations


def test_spcs_cli_end_to_end_sample():
    """A handful of zones through the actual CLI filter (argv + stdin
    text path), asserting the %.3f formatted output verbatim."""
    import subprocess
    import sys

    cases = [
        ("nad27:5001", "-134d00'00.000 55d00'00.000", "2615716.535\t1156768.938"),
        ("nad83:5001", "-134d00'00.000 55d00'00.000", "2616018.154\t1156379.643"),
        ("nad27:3104", "-73d02'36.247 40d47'50.624", "2264860.626\t209793.919"),
    ]
    env = dict(os.environ, PROJ_SPARK_LIB=NAD)
    for init, inp, expected in cases:
        p = subprocess.run(
            [sys.executable, "-m", "proj_spark.cli", "proj",
             f"+units=us-ft +init={init}", "-f", "%.3f"],
            input=inp + "\n", capture_output=True, text=True, env=env,
            cwd="/root/repo",
        )
        assert p.returncode == 0, p.stderr
        assert p.stdout.strip().startswith(expected), (init, p.stdout, expected)
