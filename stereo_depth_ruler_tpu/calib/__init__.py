from .config import StereoRig, load_opencv_yaml, save_opencv_yaml  # noqa: F401
