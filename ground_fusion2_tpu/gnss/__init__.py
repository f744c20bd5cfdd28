from . import atmosphere, ephemeris, frames, global_opt, sim, spp  # noqa: F401
