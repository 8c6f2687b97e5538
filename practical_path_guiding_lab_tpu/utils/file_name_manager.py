"""Output-path registry (reference: src/file_name_manager.py:4-68).

Output tree: debug/<scene>/{tree-data,image,plot,obj,performance}/
"""
from __future__ import annotations

from pathlib import Path


class FileNameManager:
    DEBUG_ROOT = Path("debug")
    scene_name = "scene"

    TREE_DATA_FOLDER_PATH = ""
    IMAGE_FOLDER_PATH = ""
    PLOT_FOLDER_PATH = ""
    OBJ_FOLDER_PATH = ""
    PERFORMANCE_FOLDER_PATH = ""

    @classmethod
    def setSceneName(cls, name: str):
        cls.scene_name = name
        base = cls.DEBUG_ROOT / name
        cls.TREE_DATA_FOLDER_PATH = str(base / "tree-data") + "/"
        cls.IMAGE_FOLDER_PATH = str(base / "image") + "/"
        cls.PLOT_FOLDER_PATH = str(base / "plot") + "/"
        cls.OBJ_FOLDER_PATH = str(base / "obj") + "/"
        cls.PERFORMANCE_FOLDER_PATH = str(base / "performance") + "/"

    @classmethod
    def createDebugFolder(cls):
        for p in (
            cls.TREE_DATA_FOLDER_PATH,
            cls.IMAGE_FOLDER_PATH,
            cls.PLOT_FOLDER_PATH,
            cls.OBJ_FOLDER_PATH,
            cls.PERFORMANCE_FOLDER_PATH,
        ):
            Path(p).mkdir(parents=True, exist_ok=True)

    @classmethod
    def generateTreeDataFileName(cls, iteration: int) -> str:
        return f"{cls.TREE_DATA_FOLDER_PATH}{cls.scene_name}_iter-{iteration}.npz"

    @classmethod
    def generateImageFileName(cls, iteration: int, spp: int) -> str:
        return f"{cls.IMAGE_FOLDER_PATH}{cls.scene_name}_iter-{iteration}_spp-{spp}"

    @classmethod
    def generateOBJFileName(cls, iteration: int) -> str:
        return f"{cls.OBJ_FOLDER_PATH}{cls.scene_name}_iter-{iteration}.obj"
