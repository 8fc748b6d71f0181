"""Tabular foundation-model branch.

Export surface mirrors the reference's vendored `tabpfn_extensions`
package (models/tabpfn-extensions/src/tabpfn_extensions/__init__.py:9-31),
with the in-context learner as the default backend.
"""

from .embedding import OoFEmbedding, TabPFNEmbedding
from .ensembles import (AutoICLClassifier, GreedyWeightedEnsemble,
                        make_stacking_classifier, make_voting_classifier)
from .hpo import TunedICLClassifier
from .icl import ICLClassifier, ICLConfig, ICLTransformer, pretrain_icl
from .many_class import ManyClassClassifier
from .rf_icl import DecisionTreeICLClassifier, RandomForestICLClassifier
from .scoring import safe_roc_auc_score, score_classification, score_regression
from .unsupervised import TabularUnsupervisedModel

# reference-name aliases (drop-in for tabpfn_extensions users)
AutoTabPFNClassifier = AutoICLClassifier
TunedTabPFNClassifier = TunedICLClassifier
TabPFNUnsupervisedModel = TabularUnsupervisedModel
DecisionTreeTabPFNClassifier = DecisionTreeICLClassifier
RandomForestTabPFNClassifier = RandomForestICLClassifier

__all__ = [
    "OoFEmbedding", "TabPFNEmbedding", "ICLClassifier", "ICLConfig",
    "ICLTransformer", "pretrain_icl", "ManyClassClassifier",
    "AutoICLClassifier", "GreedyWeightedEnsemble", "TunedICLClassifier",
    "TabularUnsupervisedModel", "DecisionTreeICLClassifier",
    "RandomForestICLClassifier", "make_voting_classifier",
    "make_stacking_classifier", "safe_roc_auc_score",
    "score_classification", "score_regression",
    "AutoTabPFNClassifier", "TunedTabPFNClassifier",
    "TabPFNUnsupervisedModel", "DecisionTreeTabPFNClassifier",
    "RandomForestTabPFNClassifier",
]
