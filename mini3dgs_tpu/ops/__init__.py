from .projection import Projected, project_gaussians
from .renderer import RenderSettings, render
