from pharmaforge_tpu.utils.misc import (
    get_prot_atom_ph_type_maps,
    write_pharmacophore_file,
)
from pharmaforge_tpu.utils.relative_paths import fix_relative_path
