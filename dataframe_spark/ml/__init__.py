from .cox import CoxModel, fit_cox, partial_hazard_expr
from .decision_tree import Tree, fit_decision_tree, tao_optimize, tree_to_expr
from .metrics import binary_metrics, lift_table, multiclass_metrics
from .ols import OLSModel, fit_ols, linear_fit_simple, predict_ols_expr
from .naive_bayes import (
    NaiveBayesModel,
    fit_naive_bayes,
    predict_naive_bayes,
)
from .logreg import (
    LogisticModel,
    fit_logistic_regression,
    predict_expr,
    predict_proba_expr,
)
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
    "LogisticModel",
    "fit_logistic_regression",
    "predict_expr",
    "predict_proba_expr",
    "fit_decision_tree",
    "tao_optimize",
    "tree_to_expr",
    "Tree",
    "BeamConfig",
    "SynthesisResult",
    "beam_search",
    "fit_classifier",
    "fit_regression",
    "mutual_information",
    "synthesize_feature_expr",
    "OLSModel",
    "fit_ols",
    "linear_fit_simple",
    "predict_ols_expr",
    "NaiveBayesModel",
    "fit_naive_bayes",
    "predict_naive_bayes",
]
