from .ddr import DDRPredictor, DDRVisualizer
from .interpreter import IntegratedGradients, Interpreter, integrated_gradients
