"""Dataset registry (mirrors datasets/__init__.py:9-16 in the reference)."""
from .blender import BlenderDataset
from .dtu import DTUDataset
from .llff import COLMAPDataset, IBRNetDataset, LLFFDataset
from .loader import DataLoader, collate
from .tnt import TNTDataset

datas_dict = {
    "dtu": DTUDataset,
    "blender": BlenderDataset,
    "llff": LLFFDataset,
    "colmap": COLMAPDataset,
    "ibrnet": IBRNetDataset,
    "tnt": TNTDataset,
}
