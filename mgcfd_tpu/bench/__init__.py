from .flagship import flagship_mesh, FLAGSHIP_SPEC

__all__ = ["flagship_mesh", "FLAGSHIP_SPEC"]
