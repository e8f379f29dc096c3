"""Problem generators ("models") — reference: src/prob/ (68 files).

Each problem is a class with the same hook surface the reference requires of
every problem generator (src/prototypes.h:199-208):

  - ``init(par, sim, grid) -> State``          (problem())
  - ``static_grav_pot(x1,x2,x3)`` optional     (enrolled StaticGravPot)
  - ``userwork_in_loop(state, sim, grid)``     (Userwork_in_loop)
  - ``userwork_after_loop(state, sim, grid)``  (Userwork_after_loop)
  - ``bc_ix1(state, grid, sim)`` etc. optional (bvals_mhd_fun)
  - ``radplanes`` optional list                (add_radplane_3d)

The active problem is chosen at runtime (registry below) instead of the
reference's configure-time symlink (src/Makefile.in:34).
"""

from __future__ import annotations

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


_BUILTIN = ("shkset1d", "linear_wave", "blast", "ifront", "ioniz_sphere",
            "jeans", "shkset2d", "shkset3d", "kh", "rt", "orszag_tang",
            "cpaw", "field_loop", "hgb", "cylblast", "cylwindrot", "turb",
            "strat", "par_epicycle", "par_friction", "noh", "cshock1d",
            "twoibw", "pgflow", "hall_drift", "cylwindrotb", "shu_osher",
            "lw_implode", "rotor", "current_sheet", "testsedov", "carbuncle")


def get_problem(name: str):
    if name not in _REGISTRY:
        import importlib
        for mod in _BUILTIN:
            # a missing/broken builtin module is a packaging bug: fail
            # loudly (round 4 silently swallowed ImportError, letting
            # PARITY claim problems that did not exist)
            importlib.import_module(f"{__name__}.{mod}")
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown problem {name!r}; known: {sorted(_REGISTRY)}")
