from .wnn import Wnn
from .io import load_wnn, load_grayscale_image, parse_png_file

__all__ = ["Wnn", "load_wnn", "load_grayscale_image", "parse_png_file"]
