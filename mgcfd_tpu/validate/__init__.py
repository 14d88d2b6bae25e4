from .golden import (identify_differences, output_filepath,
                     solution_filepath, dump_variables, read_solution)

__all__ = ["identify_differences", "output_filepath", "solution_filepath",
           "dump_variables", "read_solution"]
