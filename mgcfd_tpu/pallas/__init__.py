from .flux_shift import pallas_shift_flux, pallas_shift_available

__all__ = ["pallas_shift_flux", "pallas_shift_available"]
