"""Dataset registry (reference dataLoader/__init__.py:9-13)."""

from .blender import BlenderDataset
from .llff import LLFFDataset
from .nsvf import NSVF
from .tankstemple import TanksTempleDataset
from .human import HumanDataset

dataset_dict = {
    "blender": BlenderDataset,
    "llff": LLFFDataset,
    "nsvf": NSVF,
    "tankstemple": TanksTempleDataset,
    "human": HumanDataset,
}
