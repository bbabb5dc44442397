"""Kernel package: importing it loads the full projection registry
(core families + the extended pj_list inventory in extra.py)."""
from . import core as core  # noqa: F401
from . import extra as extra  # noqa: F401  (registers extra kernels)
from . import extra2 as extra2  # noqa: F401  (oblique/DGGS/putp batch)
from . import extra3 as extra3  # noqa: F401  (conformal/oblique batch)
from . import extra4 as extra4  # noqa: F401  (ob_tran/ocea/mod_ster)
from . import extra5 as extra5  # noqa: F401  (sconics/igh)
from . import extra6 as extra6  # noqa: F401  (wink/mbt/vandg/sterea/calcofi/labrd/rouss)
from . import extra7 as extra7  # noqa: F401  (bipc/chamb)
from . import extra8 as extra8  # noqa: F401  (qsc/lsat)
from . import extra9 as extra9  # noqa: F401  (isea)
