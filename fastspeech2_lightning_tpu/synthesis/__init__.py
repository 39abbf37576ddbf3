from .writers import (
    get_synthesis_output_writers,
    PredictionWritingSpecWriter,
    PredictionWritingTextGridWriter,
    PredictionWritingReadAlongWriter,
    PredictionWritingOfflineRASWriter,
    PredictionWritingWavWriter,
    ScorerWriter,
)
from .prepare import prepare_data, validate_data_keys_with_model_keys

__all__ = [
    "get_synthesis_output_writers",
    "PredictionWritingSpecWriter",
    "PredictionWritingTextGridWriter",
    "PredictionWritingReadAlongWriter",
    "PredictionWritingOfflineRASWriter",
    "PredictionWritingWavWriter",
    "ScorerWriter",
    "prepare_data",
    "validate_data_keys_with_model_keys",
]
