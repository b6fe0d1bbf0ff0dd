"""torchvision.transforms.functional_tensor shim."""
import torch


def rgb_to_grayscale(img, num_output_channels=1):
    """ITU-R 601-2 luma transform on a channel-first tensor."""
    r, g, b = img.unbind(dim=-3)
    gray = (0.2989 * r + 0.587 * g + 0.114 * b).to(img.dtype)
    gray = gray.unsqueeze(dim=-3)
    if num_output_channels == 3:
        gray = gray.expand(img.shape)
    return gray
