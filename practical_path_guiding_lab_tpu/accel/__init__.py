from .traverse import intersect, occluded  # noqa: F401
