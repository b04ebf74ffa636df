from .landmark_blocks import invert_landmark_blocks_pallas

__all__ = ["invert_landmark_blocks_pallas"]
