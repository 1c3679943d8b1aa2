"""Agents/learners: random baseline, tabular Q-learning, batched DQN."""
