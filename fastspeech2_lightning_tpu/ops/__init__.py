from .masking import mask_from_lens
from .mas import mas_width1_batched, mas_width1_numpy
from .length_regulator import length_regulate, gaussian_upsampling
from .variance import average_variance, bucketize
from .ctc import attention_ctc_loss, attention_binarization_loss

__all__ = [
    "mask_from_lens",
    "mas_width1_batched",
    "mas_width1_numpy",
    "length_regulate",
    "gaussian_upsampling",
    "average_variance",
    "bucketize",
    "attention_ctc_loss",
    "attention_binarization_loss",
]
