from .ddr import DDRPredictor, DDRVisualizer
from .interpreter import Interpreter
