from . import (atmosphere, ephemeris, frames, global_opt, rinex,  # noqa: F401
               sim, spp)
