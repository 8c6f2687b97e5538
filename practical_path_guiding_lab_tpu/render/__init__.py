from . import film, path_tracer, variance  # noqa: F401
