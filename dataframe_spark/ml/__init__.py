from .decision_tree import Tree, fit_decision_tree, tree_to_expr
from .synthesis import (
    BeamConfig,
    SynthesisResult,
    beam_search,
    fit_classifier,
    fit_regression,
    mutual_information,
    synthesize_feature_expr,
)

__all__ = [
    "fit_decision_tree",
    "tree_to_expr",
    "Tree",
    "BeamConfig",
    "SynthesisResult",
    "beam_search",
    "fit_classifier",
    "fit_regression",
    "mutual_information",
    "synthesize_feature_expr",
]
