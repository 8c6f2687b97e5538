from . import exr, hdr, image, obj, serialized  # noqa: F401
