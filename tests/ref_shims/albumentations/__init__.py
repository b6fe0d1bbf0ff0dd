"""albumentations shim: only the symbol the reference's bsrgan __main__
demo touches (SmallestMaxSize). Never exercised by oracle tests — present
so `import ldm.modules.image_degradation.bsrgan` succeeds."""


class SmallestMaxSize:
    def __init__(self, max_size, interpolation=None):
        self.max_size = max_size
        self.interpolation = interpolation

    def __call__(self, image=None, **kw):
        raise NotImplementedError("albumentations shim is import-only")
