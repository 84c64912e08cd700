from .decision_tree import Tree, fit_decision_tree, tree_to_expr

__all__ = ["fit_decision_tree", "tree_to_expr", "Tree"]
