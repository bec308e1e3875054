"""Device-side tensor ops: feature-map sampling, kNN, cluster pooling."""
