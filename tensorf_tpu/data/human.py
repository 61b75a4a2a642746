"""THuman2.0 render loader (blender-style transforms json).

Parity with reference dataLoader/human.py:13-158: identical to the blender
loader except for the Windows-path parsing of ``file_path``
(human.py:93-94, images live under ``<root>/<split>/<name>.png``) and the
corrected few-shot selection via ``N_imgs``/``indexs`` (human.py:73-76).
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

from .blender import BlenderDataset


class HumanDataset(BlenderDataset):
    def __init__(
        self,
        datadir: str,
        split: str = "train",
        downsample: float = 1.0,
        is_stack: bool = False,
        N_vis: int = -1,
        N_imgs: int = 0,
        indexs: List[int] = (),
        num_images: Union[int, List[int], None] = -1,
        **kw,
    ):
        # Map the human-loader few-shot args onto the shared selection path.
        if len(indexs) > 0:
            num_images = list(indexs)
        elif N_imgs and N_imgs > 0:
            num_images = int(N_imgs)
        self._human_paths = True
        super().__init__(
            datadir,
            split=split,
            downsample=downsample,
            is_stack=is_stack,
            N_vis=N_vis,
            num_images=num_images,
            **kw,
        )

    def _frame_image_path(self, frame) -> str:
        import os

        # Windows-path parsing (reference human.py:93-94).
        file_path = frame["file_path"].split("\\")[-1].split(".")[-2]
        return os.path.join(self.root_dir, self.split, file_path + ".png")
