"""Version for subpixal_tpu."""

__version__ = "0.5.0"
