from .blocks import BlockInfo, BlockLayout, index_vec
from .state import ModelState, init_state

__all__ = ["BlockInfo", "BlockLayout", "index_vec", "ModelState", "init_state"]
