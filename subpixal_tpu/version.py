"""Version for subpixal_tpu."""

__version__ = "0.2.0"
