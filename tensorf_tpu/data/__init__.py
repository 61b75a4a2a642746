"""Dataset registry (reference dataLoader/__init__.py:9-13, plus the
reconstructed YourOwnDataset for self-captured colmap2nerf scenes)."""

from .blender import BlenderDataset
from .llff import LLFFDataset
from .nsvf import NSVF
from .tankstemple import TanksTempleDataset
from .human import HumanDataset
from .your_own_data import YourOwnDataset

dataset_dict = {
    "blender": BlenderDataset,
    "llff": LLFFDataset,
    "tankstemple": TanksTempleDataset,
    "nsvf": NSVF,
    "human": HumanDataset,
    "own_data": YourOwnDataset,
}
