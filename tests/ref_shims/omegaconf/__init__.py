"""omegaconf shim: just the symbols the reference touches lazily."""
from .listconfig import ListConfig  # noqa: F401


class DictConfig(dict):
    pass


class OmegaConf:
    @staticmethod
    def to_container(cfg, resolve=True):
        return cfg

    @staticmethod
    def create(obj=None):
        return obj if obj is not None else {}
