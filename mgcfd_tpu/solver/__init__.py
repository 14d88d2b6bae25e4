from .solver import MGCFDSolver, DeviceMesh, prepare_device_mesh

__all__ = ["MGCFDSolver", "DeviceMesh", "prepare_device_mesh"]
