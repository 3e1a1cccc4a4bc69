from cspn_monodepth_tpu.utils.logging import (
    CSVLogger,
    colored_depthmap,
    merge_into_row,
    save_image,
)

__all__ = ["CSVLogger", "colored_depthmap", "merge_into_row", "save_image"]
