from .sdtree import SDTree, SDTreeDevice  # noqa: F401
