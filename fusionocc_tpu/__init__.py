"""fusionocc_tpu: TPU-native multi-modal 3D occupancy prediction framework.

See README.md for the layout and PARITY.md for reference coverage.
"""

from .config import (GridConfig, ModelConfig, OptimConfig, TrainConfig,
                     full_model_config, tiny_model_config)

__version__ = '0.1.0'

__all__ = ['GridConfig', 'ModelConfig', 'OptimConfig', 'TrainConfig',
           'full_model_config', 'tiny_model_config', '__version__']
