from . import vqperceptual  # noqa: F401
