"""PPO training stack (flax/optax), replacing the reference's rl-games
integration (utils/rlgames_utils.py, utils/torch_runner.py, external
rl_games A2CAgent)."""
