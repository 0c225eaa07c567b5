from .resample import multinomial_resample, systematic_resample
