from .sharding import make_mesh, render_pass_sharded  # noqa: F401
