"""Transcription-diff tests (VERDICT round-2 item 3): the mod_ster /
sconics coefficient tables and setup constants were transcribed from
the reference C by hand and previously only roundtrip-verified — a
wrong-but-self-consistent constant would survive a roundtrip.  These
tests parse the constants STRAIGHT OUT of the reference C source and
diff them against the Python tables / compiled setups, the same
technique the SPCS/testvarious replays proved.

Reference files (read-only, parsed in place):
  /root/reference/src/PJ_mod_ster.c   (coefficient arrays + frames)
  /root/reference/src/PJ_sconics.c    (per-type setup formulas)
  /root/reference/src/PJ_oea.c        (setup derivations)
"""
from __future__ import annotations

import math
import re

import numpy as np
import pytest

REF = "/root/reference/src"


# ------------------------------------------------------------ PJ_mod_ster.c
def _parse_complex_arrays(src: str) -> dict[str, list[complex]]:
    """Extract every `static COMPLEX`-style initializer list from the
    ENTRY blocks as {entry_name + optional table suffix: [complex...]}."""
    out: dict[str, list[complex]] = {}
    # split on ENTRY0(name) ... ENDENTRY
    for m_ent in re.finditer(r"ENTRY0\((\w+)\)(.*?)ENDENTRY", src, re.S):
        name, body = m_ent.group(1), m_ent.group(2)
        # arrays appear as  NAME[] = { {re, im}, ... }  — possibly two
        # (ABe / ABs) comma-chained in one declaration; allow one level
        # of nested {re, im} braces inside the initializer
        for m_arr in re.finditer(
            r"(\w+)\[\]\s*=\s*\{((?:[^{}]|\{[^{}]*\})*)\}", body, re.S
        ):
            arr_name, arr_body = m_arr.group(1), m_arr.group(2)
            pairs = re.findall(
                r"\{\s*(-?[\d.]+|0\.?)\s*,\s*(-?[\d.]+|0\.?)\s*\}", arr_body
            )
            out[f"{name}.{arr_name}"] = [
                complex(float(r), float(i)) for r, i in pairs
            ]
    return out


def _parse_frames(src: str) -> dict[str, dict]:
    """Per-ENTRY lam0/phi0 (DEG_TO_RAD * value), n, and a/es overrides."""
    out: dict[str, dict] = {}
    for m_ent in re.finditer(r"ENTRY0\((\w+)\)(.*?)ENDENTRY", src, re.S):
        name, body = m_ent.group(1), m_ent.group(2)
        d: dict = {}
        for key in ("lam0", "phi0"):
            mm = re.search(rf"P->{key}\s*=\s*DEG_TO_RAD\s*\*\s*(-?[\d.]+)", body)
            if mm:
                d[key + "_deg"] = float(mm.group(1))
        mm = re.search(r"P->n\s*=\s*(\d+)", body)
        if mm:
            d["n"] = int(mm.group(1))
        for mm in re.finditer(r"P->a\s*=\s*([\d.]+)", body):
            d.setdefault("a_vals", []).append(float(mm.group(1)))
        mm = re.search(r"P->es\s*=\s*([\d.]+)\)", body)
        if mm:
            d["es_forced"] = float(mm.group(1))
        d["sets_es_zero"] = bool(re.search(r"P->es\s*=\s*0\.;", body))
        out[name] = d
    return out


def test_mod_ster_tables_match_reference_source():
    from proj_spark.kernels.extra4 import _MOD_STER_TABLES

    src = open(f"{REF}/PJ_mod_ster.c").read()
    arrays = _parse_complex_arrays(src)
    frames = _parse_frames(src)

    # simple single-table entries
    assert _MOD_STER_TABLES["mil_os"][3] == arrays["mil_os.AB"]
    assert _MOD_STER_TABLES["lee_os"][3] == arrays["lee_os.AB"]
    assert _MOD_STER_TABLES["gs48"][3] == arrays["gs48.AB"]
    # dual-table entries: ellipsoid (ABe) and sphere (ABs)
    for pid in ("alsk", "gs50"):
        lam0, phi0, ab_ell, ab_sph = _MOD_STER_TABLES[pid]
        assert ab_ell == arrays[f"{pid}.ABe"], pid
        assert ab_sph == arrays[f"{pid}.ABs"], pid

    # frames: lam0/phi0 degrees and polynomial order (n + 1 coeffs)
    for pid in ("mil_os", "lee_os", "gs48", "alsk", "gs50"):
        lam0, phi0 = _MOD_STER_TABLES[pid][0], _MOD_STER_TABLES[pid][1]
        assert lam0 == frames[pid]["lam0_deg"], pid
        assert phi0 == frames[pid]["phi0_deg"], pid
        n = frames[pid]["n"]
        table = _MOD_STER_TABLES[pid][3]
        assert len(table) == n + 1, pid

    # coefficient counts parsed sanely (guards the regexes themselves)
    assert len(arrays["gs50.ABe"]) == 10 and len(arrays["alsk.ABe"]) == 6


def test_mod_ster_crs_overrides_match_entry_bodies():
    """crs.py must force the same a/es the ENTRY bodies force."""
    from proj_spark.crs import CRS

    src = open(f"{REF}/PJ_mod_ster.c").read()
    frames = _parse_frames(src)

    # alsk/gs50 with a (any) ellipsoid -> fixed a=6378206.4 es=.00676866
    es_forced = frames["alsk"]["es_forced"]
    a_ell = 6378206.4
    assert a_ell in frames["alsk"]["a_vals"]
    for pid in ("alsk", "gs50"):
        c = CRS.from_proj4(f"+proj={pid} +ellps=WGS84")
        assert c.a == a_ell and c.es == es_forced, pid
        # sphere request -> sphere table radius
        c2 = CRS.from_proj4(f"+proj={pid} +R=7000000")
        assert c2.a == 6370997.0 and c2.es == 0.0, pid
        assert 6370997.0 in frames[pid]["a_vals"]
    # gs48: always the sphere
    assert frames["gs48"]["sets_es_zero"]
    c = CRS.from_proj4("+proj=gs48 +ellps=WGS84")
    assert c.a == 6370997.0 and c.es == 0.0
    # mil_os / lee_os: es forced to 0, a untouched
    for pid in ("mil_os", "lee_os"):
        assert frames[pid]["sets_es_zero"]
        c = CRS.from_proj4(f"+proj={pid} +ellps=WGS84")
        assert c.es == 0.0 and c.a == 6378137.0, pid
    # datum transforms keep the USER ellipsoid (a_orig/es_orig recorded
    # before the ENTRY override, pj_init ordering)
    c = CRS.from_proj4("+proj=alsk +ellps=WGS84")
    assert c.a_orig == 6378137.0 and abs(c.es_orig - 0.00669437999014) < 1e-12


# ------------------------------------------------------------ PJ_sconics.c
def _c_expr_to_py(expr: str) -> str:
    """Mechanical C -> Python rewrite for the simple setup expressions
    (different code path from the hand transcription in extra5.py, so a
    typo there cannot also be here)."""
    e = expr.strip().rstrip(";")
    e = e.replace("P->", "")
    e = re.sub(r"\bdel\b", "del_", e)
    for fn in ("sin", "cos", "tan", "sqrt", "fabs"):
        e = re.sub(rf"(?<![\w.]){fn}\(", f"math.{'fabs' if fn == 'fabs' else fn}(", e)
    e = e.replace("math.fabs(", "abs(")
    return e


def _sconics_setup_from_source(typ: str, p1: float, p2: float, phi0: float):
    """Evaluate the reference's own `case ...:` setup block, extracted
    from PJ_sconics.c text, to produce (n, rho_c, rho_0, c1, c2)."""
    src = open(f"{REF}/PJ_sconics.c").read()
    setup = src[src.index("setup(PJ *P)"):]
    case_key = {
        "tissot": "TISSOT", "murd1": "MURD1", "murd2": "MURD2",
        "murd3": "MURD3", "euler": "EULER", "pconic": "PCONIC",
        "vitk1": "VITK1",
    }[typ]
    mm = re.search(rf"case {case_key}:(.*?)break;", setup, re.S)
    assert mm, typ
    block = mm.group(1)
    env = {
        "math": math,
        "del_": 0.5 * (p2 - p1),
        "sig": 0.5 * (p2 + p1),
        "phi0": phi0,
        "n": 0.0, "rho_c": 0.0, "rho_0": 0.0, "c1": 0.0, "c2": 0.0,
        "cs": 0.0,
    }
    def _extract_embedded(line: str) -> str:
        """Apply embedded C assignments `(var = expr)` (balanced-paren
        scan) and replace them with the variable name.  Handles
        `(cs = sqrt(cos(del)))` and `fabs(del = P->phi0 - P->sig)`."""
        while True:
            mm2 = re.search(r"\((\w+)\s*=\s*", line)
            if not mm2:
                return line
            start = mm2.start()
            depth = 0
            for i in range(start, len(line)):
                if line[i] == "(":
                    depth += 1
                elif line[i] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            var = mm2.group(1)
            expr = line[mm2.end(): i]
            key = "del_" if var == "del" else var
            env[key] = eval(_c_expr_to_py(expr), env)
            line = line[:start] + key + line[i + 1:]

    for line in block.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(("if", "E_ERROR")):
            # C conditions may carry embedded assignments that later
            # lines depend on (pconic: `fabs(del = P->phi0 - P->sig)`)
            _extract_embedded(line)
            continue
        line = _extract_embedded(line.rstrip(";"))
        lhs, rhs = line.split("=", 1)
        lhs = lhs.replace("P->", "").strip()
        if lhs == "del":
            lhs = "del_"
        if lhs.endswith("*"):  # del *= 0.5
            lhs = lhs[:-1].strip()
            if lhs == "del":
                lhs = "del_"
            env[lhs] = env[lhs] * eval(_c_expr_to_py(rhs), env)
        else:
            env[lhs] = eval(_c_expr_to_py(rhs), env)
    return env["n"], env["rho_c"], env["rho_0"], env["c1"], env["c2"]


@pytest.mark.parametrize(
    "typ", ["tissot", "murd1", "murd2", "murd3", "euler", "pconic", "vitk1"]
)
def test_sconics_setup_constants_match_reference_source(typ):
    """Compare my compiled kernel against constants evaluated from the
    C source text itself at several parallel choices."""
    from proj_spark.crs import CRS
    from proj_spark.kernels.core import compile_proj

    for lat1, lat2, lat0 in ((30.0, 60.0, 0.0), (20.0, 65.0, 40.0), (-55.0, -25.0, -35.0)):
        p1, p2, phi0 = map(math.radians, (lat1, lat2, lat0))
        n, rho_c, rho_0, c1, c2 = _sconics_setup_from_source(typ, p1, p2, phi0)
        crs = CRS.from_proj4(
            f"+proj={typ} +lat_1={lat1} +lat_2={lat2} +lat_0={lat0} +R=1"
        )
        cp = compile_proj(crs)
        # probe the kernel: fwd(0, phi0) = (0, rho_0 - rho(phi0)) and
        # fwd(lam, phi) = (rho sin(n lam), rho_0 - rho cos(n lam))
        lam = np.array([0.0, 0.4, -0.7])
        phi = np.array([phi0, 0.5 * (p1 + p2), p1])
        x, y = cp.fwd(lam, phi)
        sig = 0.5 * (p2 + p1)
        if typ == "murd2":
            rho = rho_c + np.tan(sig - phi)
        elif typ == "pconic":
            rho = c2 * (c1 - np.tan(phi - sig))
        else:
            rho = rho_c - phi
        np.testing.assert_allclose(x, rho * np.sin(n * lam), rtol=0, atol=1e-14)
        np.testing.assert_allclose(
            y, rho_0 - rho * np.cos(n * lam), rtol=0, atol=1e-14
        )


# ---------------------------------------------------------------- PJ_oea.c
def test_oea_requires_m_and_n_like_reference():
    """PJ_oea.c:41-43: missing/non-positive m or n is E_ERROR(-39),
    never a silent default."""
    from proj_spark.crs import CRS
    from proj_spark.kernels.core import compile_proj

    for bad in ("+proj=oea +R=1", "+proj=oea +m=2 +R=1", "+proj=oea +m=2 +n=-1 +R=1"):
        with pytest.raises(ValueError):
            compile_proj(CRS.from_proj4(bad))


def test_oea_setup_matches_reference_derivations():
    """The oea forward at probe points must equal the C formulas
    (PJ_oea.c:9-21) evaluated independently here."""
    from proj_spark.crs import CRS
    from proj_spark.kernels.core import compile_proj

    m_, n_, theta_deg, lat0 = 3.0, 1.5, 25.0, 40.0
    crs = CRS.from_proj4(
        f"+proj=oea +m={m_} +n={n_} +theta={theta_deg} +lat_0={lat0} +R=1"
    )
    cp = compile_proj(crs)
    theta = math.radians(theta_deg)
    phi0 = math.radians(lat0)
    sp0, cp0 = math.sin(phi0), math.cos(phi0)
    lam = np.array([0.3, -0.8, 0.0])
    phi = np.array([0.7, 0.2, -0.3])
    # straight from the C text
    cp_ = np.cos(phi)
    sp = np.sin(phi)
    cl = np.cos(lam)
    Az = np.arctan2(cp_ * np.sin(lam), cp0 * sp - sp0 * cp_ * cl) + theta
    shz = np.sin(0.5 * np.arccos(sp0 * sp + cp0 * cp_ * cl))
    M = np.arcsin(shz * np.sin(Az))
    N = np.arcsin(shz * np.cos(Az) * np.cos(M) / np.cos(M * 2.0 / m_))
    exp_y = n_ * np.sin(N * 2.0 / n_)
    exp_x = m_ * np.sin(M * 2.0 / m_) * np.cos(N) / np.cos(N * 2.0 / n_)
    x, y = cp.fwd(lam, phi)
    np.testing.assert_allclose(x, exp_x, atol=1e-14)
    np.testing.assert_allclose(y, exp_y, atol=1e-14)
