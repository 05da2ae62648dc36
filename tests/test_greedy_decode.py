import numpy as np

from pemp_tpu.decode import greedy_person_construction


def test_greedy_two_people():
    det = np.array(
        [[10, 10, 0], [12, 20, 1], [40, 12, 0], [42, 22, 1]], np.int64
    )
    node_scores = np.array([0.9, 0.8, 0.95, 0.7])
    edges = np.array([[0, 2, 0], [1, 3, 3]])
    edge_scores = np.array([0.9, 0.85, 0.1])
    persons, labels = greedy_person_construction(
        det, node_scores, edge_scores, None, edges, num_joints=2
    )
    assert persons.shape[0] == 2
    xs = sorted(p[0][0] for p in persons)
    assert xs == [10, 40]
    # node 1 claimed by 0, node 3 by 2
    assert labels[1] == 0 and labels[3] == 2


def test_greedy_reassigns_on_higher_score():
    # node 2 (type 1) claimed first by 0 (score .6) then stolen by 1 (.9)
    det = np.array([[0, 0, 0], [5, 0, 0], [2, 2, 1]], np.int64)
    node_scores = np.array([0.9, 0.9, 0.9])
    edges = np.array([[0, 1], [2, 2]])
    edge_scores = np.array([0.6, 0.9])
    persons, labels = greedy_person_construction(
        det, node_scores, edge_scores, None, edges, num_joints=2
    )
    assert labels[2] == 1


def test_greedy_low_score_nodes_cannot_seed():
    """A node below 0.5 never becomes a cluster core (reference: Utils.py:557)
    but can still be claimed by another core."""
    det = np.array([[0, 0, 0], [2, 2, 1]], np.int64)
    node_scores = np.array([0.3, 0.9])
    edges = np.array([[0], [1]])
    edge_scores = np.array([0.9])
    persons, labels = greedy_person_construction(
        det, node_scores, edge_scores, None, edges, num_joints=2
    )
    assert labels[0] == 1  # claimed by node 1's cluster, not its own core
    # and entirely-low-score graphs yield nothing
    persons2, labels2 = greedy_person_construction(
        det, np.array([0.3, 0.2]), edge_scores, None, edges, num_joints=2
    )
    assert (labels2 == -1).all() and persons2.shape[0] == 0
