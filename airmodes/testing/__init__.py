from .encoder import *  # noqa: F401,F403
