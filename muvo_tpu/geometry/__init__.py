from muvo_tpu.geometry.camera import (  # noqa: F401
    bev_params_to_intrinsics,
    calculate_geometry,
    calculate_geometry_from_config,
    get_extrinsics,
    get_out_of_view_mask,
    intrinsics_inverse,
)
from muvo_tpu.geometry.range_view import RangeProjector  # noqa: F401
from muvo_tpu.geometry.voxel import (  # noqa: F401
    convert_coor_img,
    convert_coor_lidar,
    depth_to_pcd,
    merge_point_clouds,
    voxel_filter,
)
