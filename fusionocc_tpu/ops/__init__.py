from .bev_pool import (PoolingIndex, bev_pool, bev_pool_dense_reference,
                       prepare_pooling_index)
from .grid_sample import grid_sample_2d, resize_bilinear, resize_trilinear
from .sparse_conv import (build_strided_index, build_subm_index,
                          out_shape_strided, sparse_conv1x1_apply,
                          sparse_conv_apply, sparse_to_dense)
from .voxelize import SparseVoxels, coords_to_key, key_to_coords, voxelize_mean

__all__ = [
    'PoolingIndex', 'bev_pool', 'bev_pool_dense_reference',
    'prepare_pooling_index', 'grid_sample_2d', 'resize_bilinear',
    'resize_trilinear', 'build_strided_index', 'build_subm_index',
    'out_shape_strided', 'sparse_conv1x1_apply', 'sparse_conv_apply',
    'sparse_to_dense', 'SparseVoxels', 'coords_to_key', 'key_to_coords',
    'voxelize_mean',
]
