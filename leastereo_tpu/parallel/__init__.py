from .mesh import DATA_AXIS, DISP_AXIS, batch_sharding, make_mesh, replicated

__all__ = ["DATA_AXIS", "DISP_AXIS", "batch_sharding", "make_mesh", "replicated"]
