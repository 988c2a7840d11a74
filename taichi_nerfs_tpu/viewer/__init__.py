from .gui import NGPGUI, OrbitCamera  # noqa: F401
