from wiki_grx_gym_tpu.terrain.composer import Terrain  # noqa: F401
