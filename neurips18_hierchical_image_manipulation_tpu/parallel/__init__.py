from .mesh import make_data_mesh

__all__ = ["make_data_mesh"]
