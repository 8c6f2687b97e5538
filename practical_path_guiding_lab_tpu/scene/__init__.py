from .parser import load_file  # noqa: F401
from .scene import Scene, compile_scene  # noqa: F401
