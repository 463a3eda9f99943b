from .gmflow import init_gmflow, gmflow_extract_pair_features
