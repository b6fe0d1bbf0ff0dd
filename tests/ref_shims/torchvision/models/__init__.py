from . import inception, vgg  # noqa: F401
from .inception import Inception3, inception_v3  # noqa: F401
