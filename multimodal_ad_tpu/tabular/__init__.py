"""Tabular foundation-model branch.

Export surface mirrors the reference's vendored `tabpfn_extensions`
package (models/tabpfn-extensions/src/tabpfn_extensions/__init__.py:9-31),
with the in-context learner as the default backend.
"""

from .embedding import (EnsembleICLEmbedder, OoFEmbedding, TabPFNEmbedding,
                        select_embedder_params)
from .ensembles import (AutoICLClassifier, GreedyWeightedEnsemble,
                        make_stacking_classifier, make_voting_classifier)
from .hpo import SeedEnsembleICL, TunedICLClassifier
from .icl import ICLClassifier, ICLConfig, ICLTransformer, pretrain_icl
from .icl_regression import (RegICLConfig, RegICLTransformer,
                             pretrain_icl_regression)
from .many_class import ManyClassClassifier
from .plotting import (plot_attribution_scatter, plot_attributions,
                       plot_interactions)
from .regression import (DecisionTreeICLRegressor, ICLRegressor,
                         RandomForestICLRegressor, TunedICLRegressor)
from .rf_icl import DecisionTreeICLClassifier, RandomForestICLClassifier
from .scoring import safe_roc_auc_score, score_classification, score_regression
from .unsupervised import TabularUnsupervisedModel
from .utils import (get_device, infer_categorical_features, is_icl_estimator,
                    product_dict, softmax)

# reference-name aliases (drop-in for tabpfn_extensions users)
AutoTabPFNClassifier = AutoICLClassifier
TunedTabPFNClassifier = TunedICLClassifier
TunedTabPFNRegressor = TunedICLRegressor
TabPFNUnsupervisedModel = TabularUnsupervisedModel
DecisionTreeTabPFNClassifier = DecisionTreeICLClassifier
RandomForestTabPFNClassifier = RandomForestICLClassifier
DecisionTreeTabPFNRegressor = DecisionTreeICLRegressor
RandomForestTabPFNRegressor = RandomForestICLRegressor
TabPFNClassifier = ICLClassifier
TabPFNRegressor = ICLRegressor

__all__ = [
    "OoFEmbedding", "TabPFNEmbedding", "EnsembleICLEmbedder",
    "select_embedder_params", "ICLClassifier", "ICLConfig",
    "ICLTransformer", "pretrain_icl", "ManyClassClassifier",
    "AutoICLClassifier", "GreedyWeightedEnsemble", "TunedICLClassifier",
    "SeedEnsembleICL",
    "TabularUnsupervisedModel", "DecisionTreeICLClassifier",
    "RandomForestICLClassifier", "make_voting_classifier",
    "make_stacking_classifier", "safe_roc_auc_score",
    "score_classification", "score_regression",
    "RegICLConfig", "RegICLTransformer", "pretrain_icl_regression",
    "ICLRegressor", "TunedICLRegressor", "DecisionTreeICLRegressor",
    "RandomForestICLRegressor", "get_device", "infer_categorical_features",
    "is_icl_estimator", "product_dict", "softmax",
    "plot_attributions", "plot_attribution_scatter", "plot_interactions",
    "AutoTabPFNClassifier", "TunedTabPFNClassifier", "TunedTabPFNRegressor",
    "TabPFNUnsupervisedModel", "DecisionTreeTabPFNClassifier",
    "RandomForestTabPFNClassifier", "DecisionTreeTabPFNRegressor",
    "RandomForestTabPFNRegressor", "TabPFNClassifier", "TabPFNRegressor",
]
