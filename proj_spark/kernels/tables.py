"""Built-in CRS catalogs: ellipsoids, datums, prime meridians, units.

Behavioral reference: /root/reference/src/pj_ellps.c, pj_datums.c,
pj_units.c (values are public geodesy constants).  These tables are
resolved once at driver/plan time; nothing here runs per row.
"""
from __future__ import annotations

# name -> dict of defining params (a plus one of rf/b)
ELLPS: dict[str, dict[str, float]] = {
    "MERIT": {"a": 6378137.0, "rf": 298.257},
    "SGS85": {"a": 6378136.0, "rf": 298.257},
    "GRS80": {"a": 6378137.0, "rf": 298.257222101},
    "IAU76": {"a": 6378140.0, "rf": 298.257},
    "airy": {"a": 6377563.396, "b": 6356256.910},
    "APL4.9": {"a": 6378137.0, "rf": 298.25},
    "NWL9D": {"a": 6378145.0, "rf": 298.25},
    "mod_airy": {"a": 6377340.189, "b": 6356034.446},
    "andrae": {"a": 6377104.43, "rf": 300.0},
    "aust_SA": {"a": 6378160.0, "rf": 298.25},
    "GRS67": {"a": 6378160.0, "rf": 298.2471674270},
    "bessel": {"a": 6377397.155, "rf": 299.1528128},
    "bess_nam": {"a": 6377483.865, "rf": 299.1528128},
    "clrk66": {"a": 6378206.4, "b": 6356583.8},
    "clrk80": {"a": 6378249.145, "rf": 293.4663},
    "clrk80ign": {"a": 6378249.2, "rf": 293.4660212936269},
    "CPM": {"a": 6375738.7, "rf": 334.29},
    "delmbr": {"a": 6376428.0, "rf": 311.5},
    "engelis": {"a": 6378136.05, "rf": 298.2566},
    "evrst30": {"a": 6377276.345, "rf": 300.8017},
    "evrst48": {"a": 6377304.063, "rf": 300.8017},
    "evrst56": {"a": 6377301.243, "rf": 300.8017},
    "evrst69": {"a": 6377295.664, "rf": 300.8017},
    "evrstSS": {"a": 6377298.556, "rf": 300.8017},
    "fschr60": {"a": 6378166.0, "rf": 298.3},
    "fschr60m": {"a": 6378155.0, "rf": 298.3},
    "fschr68": {"a": 6378150.0, "rf": 298.3},
    "helmert": {"a": 6378200.0, "rf": 298.3},
    "hough": {"a": 6378270.0, "rf": 297.0},
    "intl": {"a": 6378388.0, "rf": 297.0},
    "krass": {"a": 6378245.0, "rf": 298.3},
    "kaula": {"a": 6378163.0, "rf": 298.24},
    "lerch": {"a": 6378139.0, "rf": 298.257},
    "mprts": {"a": 6397300.0, "rf": 191.0},
    "new_intl": {"a": 6378157.5, "b": 6356772.2},
    "plessis": {"a": 6376523.0, "b": 6355863.0},
    "SEasia": {"a": 6378155.0, "b": 6356773.3205},
    "walbeck": {"a": 6376896.0, "b": 6355834.8467},
    "WGS60": {"a": 6378165.0, "rf": 298.3},
    "WGS66": {"a": 6378145.0, "rf": 298.25},
    "WGS72": {"a": 6378135.0, "rf": 298.26},
    "WGS84": {"a": 6378137.0, "rf": 298.257223563},
    "sphere": {"a": 6370997.0, "b": 6370997.0},
}

# datum id -> (shift definition string key/value, ellipse)
DATUMS: dict[str, dict[str, str]] = {
    "WGS84": {"towgs84": "0,0,0", "ellps": "WGS84"},
    "GGRS87": {"towgs84": "-199.87,74.79,246.62", "ellps": "GRS80"},
    "NAD83": {"towgs84": "0,0,0", "ellps": "GRS80"},
    "NAD27": {"nadgrids": "@conus,@alaska,@ntv2_0.gsb,@ntv1_can.dat", "ellps": "clrk66"},
    "potsdam": {"towgs84": "598.1,73.7,418.2,0.202,0.045,-2.455,6.7", "ellps": "bessel"},
    "carthage": {"towgs84": "-263.0,6.0,431.0", "ellps": "clrk80ign"},
    "hermannskogel": {
        "towgs84": "577.326,90.129,463.919,5.137,1.474,5.297,2.4232",
        "ellps": "bessel",
    },
    "ire65": {"towgs84": "482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15", "ellps": "mod_airy"},
    "nzgd49": {"towgs84": "59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993", "ellps": "intl"},
    "OSGB36": {
        "towgs84": "446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894",
        "ellps": "airy",
    },
}

# prime meridian id -> offset in degrees east of greenwich
PRIME_MERIDIANS: dict[str, float] = {
    "greenwich": 0.0,
    "lisbon": -(9.0 + 7.0 / 60 + 54.862 / 3600),
    "paris": 2.0 + 20.0 / 60 + 14.025 / 3600,
    "bogota": -(74.0 + 4.0 / 60 + 51.3 / 3600),
    "madrid": -(3.0 + 41.0 / 60 + 16.58 / 3600),
    "rome": 12.0 + 27.0 / 60 + 8.4 / 3600,
    "bern": 7.0 + 26.0 / 60 + 22.5 / 3600,
    "jakarta": 106.0 + 48.0 / 60 + 27.79 / 3600,
    "ferro": -(17.0 + 40.0 / 60),
    "brussels": 4.0 + 22.0 / 60 + 4.71 / 3600,
    "stockholm": 18.0 + 3.0 / 60 + 29.8 / 3600,
    "athens": 23.0 + 42.0 / 60 + 58.815 / 3600,
    "oslo": 10.0 + 43.0 / 60 + 22.5 / 3600,
}

# unit name -> to_meter
UNITS: dict[str, float] = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 1.0 / 10,
    "cm": 1.0 / 100,
    "mm": 1.0 / 1000,
    "kmi": 1852.0,
    "in": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "fath": 1.8288,
    "ch": 20.1168,
    "link": 0.201168,
    "us-in": 1.0 / 39.37,
    "us-ft": 0.304800609601219,
    "us-yd": 0.914401828803658,
    "us-ch": 20.11684023368047,
    "us-mi": 1609.347218694437,
    "ind-yd": 0.91439523,
    "ind-ft": 0.30479841,
    "ind-ch": 20.11669506,
}
