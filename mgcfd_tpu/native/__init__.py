from .loader import native_available, parse_dat_native

__all__ = ["native_available", "parse_dat_native"]
