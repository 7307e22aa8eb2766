from .preprocess import build_preprocessor, fit_preprocessor, CLAIMS_FEATURES
from .scoring import (
    pca_reconstruction_scores,
    batch_threshold,
    with_ml_verdict,
)
from .autoencoder import NumpyAutoencoder, train_autoencoder, autoencoder_scores

__all__ = [
    "build_preprocessor",
    "fit_preprocessor",
    "CLAIMS_FEATURES",
    "pca_reconstruction_scores",
    "batch_threshold",
    "with_ml_verdict",
    "NumpyAutoencoder",
    "train_autoencoder",
    "autoencoder_scores",
]
