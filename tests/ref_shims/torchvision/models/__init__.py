from . import vgg  # noqa: F401
