from .pssmlt import IntegratorPSSMLT
