from . import reductions, moments, smoothing, interpolate, convolve, regrid

__all__ = ["reductions", "moments", "smoothing", "interpolate", "convolve",
           "regrid"]
