# populated in later milestones
