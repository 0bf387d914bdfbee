from .mesh import make_mesh, cell_sharding, init_distributed  # noqa: F401
