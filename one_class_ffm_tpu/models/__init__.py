from .blocks import BlockInfo, BlockLayout, index_vec

__all__ = ["BlockInfo", "BlockLayout", "index_vec"]
