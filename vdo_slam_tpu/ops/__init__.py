from . import fast, frontend, image, select

__all__ = ["fast", "frontend", "image", "select"]
